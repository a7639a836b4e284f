from .checkpoint import SolverCheckpoint, checkpoint_of, resume, update_rhs
from .complexity import ComplexityFit, classify_exponent, fit_power_law, validate_complexity
from .convergence import ConvergenceChecker, ConvergenceInfo
from .profiling import ProfileLog, SolveRecord, record_solve

__all__ = [
    "SolverCheckpoint",
    "checkpoint_of",
    "resume",
    "update_rhs",
    "ConvergenceChecker",
    "ConvergenceInfo",
    "ProfileLog",
    "SolveRecord",
    "record_solve",
    "ComplexityFit",
    "fit_power_law",
    "classify_exponent",
    "validate_complexity",
]
