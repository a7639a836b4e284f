"""Structured error taxonomy for the solver framework.

Mirrors the reference's error surface (13-variant Rust ``SolverError``,
/root/reference/src/error.rs:18-140, and the TS 8-code table,
/root/reference/src/core/types.ts:97-106) so callers of the reference can map
their error handling 1:1.
"""
from __future__ import annotations


class SolverError(Exception):
    """Base error. ``code`` follows the reference's E001..E008 convention."""

    code = "E000"

    def __init__(self, message: str, details: dict | None = None):
        super().__init__(message)
        self.message = message
        self.details = details or {}

    def to_dict(self) -> dict:
        return {
            "error": type(self).__name__,
            "code": self.code,
            "message": self.message,
            "details": self.details,
        }


class NotDiagonallyDominantError(SolverError):
    code = "E001"


class ConvergenceError(SolverError):
    code = "E002"


class InvalidMatrixError(SolverError):
    code = "E003"


class TimeoutError_(SolverError):
    code = "E004"


class DimensionMismatchError(SolverError):
    code = "E005"


class NumericalInstabilityError(SolverError):
    code = "E006"


class MemoryLimitError(SolverError):
    code = "E007"


class InvalidParametersError(SolverError):
    code = "E008"


class IndexOutOfBoundsError(SolverError):
    code = "E009"


class AlgorithmError(SolverError):
    code = "E010"


ERROR_CODES = {
    "NOT_DIAGONALLY_DOMINANT": "E001",
    "CONVERGENCE_FAILED": "E002",
    "INVALID_MATRIX": "E003",
    "TIMEOUT": "E004",
    "INVALID_DIMENSIONS": "E005",
    "NUMERICAL_INSTABILITY": "E006",
    "MEMORY_LIMIT_EXCEEDED": "E007",
    "INVALID_PARAMETERS": "E008",
    "INDEX_OUT_OF_BOUNDS": "E009",
    "ALGORITHM_ERROR": "E010",
}
