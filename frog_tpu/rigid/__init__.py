from .groupwise import (
    RigidGroupParams,
    StochasticParams,
    rigid_groupwise,
    stochastic_rigid,
)
from .laplace import Edge, RigidGraph, solve_positions
from .match3d import Match3DParams, match3d

__all__ = [
    "Edge",
    "Match3DParams",
    "RigidGraph",
    "RigidGroupParams",
    "StochasticParams",
    "match3d",
    "rigid_groupwise",
    "solve_positions",
    "stochastic_rigid",
]
