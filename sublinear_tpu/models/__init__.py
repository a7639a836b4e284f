from .kalman import KalmanFilter, KalmanState
from .pagerank_selector import select_samples, similarity_graph
from .solver_gate import GateConfig, GateStats, SolverGate
from .temporal_net import ResidualNet, SystemA, SystemB
from .trainer import Trainer, make_windows

__all__ = [
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
