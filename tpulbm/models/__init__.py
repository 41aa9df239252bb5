"""Model families: problem builders keyed by name."""
from .base import Problem
from . import cylinder, poiseuille

__all__ = ["Problem", "make_problem"]


def make_problem(params):
    """Build the Problem for params.problem
    ("cylinder"|"poiseuille"|"cavity"|"cylinder3d")."""
    if params.problem == "cylinder":
        return cylinder.make_problem(params)
    if params.problem == "poiseuille":
        return poiseuille.make_problem(params)
    if params.problem == "cavity":
        from . import cavity
        return cavity.make_problem(params)
    if params.problem in ("rayleigh-benard", "heated-cavity"):
        from . import rayleigh_benard
        return rayleigh_benard.make_problem(params)
    if params.problem == "cylinder3d":
        from . import cylinder3d
        return cylinder3d.make_problem(params)
    if params.problem == "multiphase":
        from . import multiphase
        return multiphase.make_problem(params)
    if params.problem in ("taylor-green", "shear-layer", "kolmogorov",
                          "passive-scalar"):
        from . import periodic2d
        return periodic2d.make_problem(params)
    raise ValueError(f"unknown problem: {params.problem!r}")
