from .atlas import average_volumes, dummy_volume
from .diffeo import check_diffeomorphism
from .meshpoints import transform_mesh, transform_point_file, transform_points
from .resample import invert_points, resample_volume

__all__ = [
    "average_volumes",
    "check_diffeomorphism",
    "dummy_volume",
    "invert_points",
    "resample_volume",
    "transform_mesh",
    "transform_point_file",
    "transform_points",
]
