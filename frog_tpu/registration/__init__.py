from .group import GroupConfig, GroupRegistration
from .state import GroupArrays, GroupMeta, build_group_state
from .stats import chi_pdf, estimate_mixture, inlier_probability

__all__ = [
    "GroupArrays",
    "GroupConfig",
    "GroupMeta",
    "GroupRegistration",
    "build_group_state",
    "chi_pdf",
    "estimate_mixture",
    "inlier_probability",
]
