from .kalman import KalmanFilter, KalmanState
from .pagerank_selector import select_samples, similarity_graph
from .quantization import (
    QuantizedParams,
    quantization_error,
    quantize_tree,
    quantized_apply,
)
from .solver_gate import GateConfig, GateStats, SolverGate
from .temporal_net import ResidualNet, SystemA, SystemB
from .trainer import Trainer, make_windows

__all__ = [
    "QuantizedParams",
    "quantize_tree",
    "quantized_apply",
    "quantization_error",
    "KalmanFilter",
    "KalmanState",
    "SolverGate",
    "GateConfig",
    "GateStats",
    "select_samples",
    "similarity_graph",
    "SystemA",
    "SystemB",
    "ResidualNet",
    "Trainer",
    "make_windows",
]
