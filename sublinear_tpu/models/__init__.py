from .callbacks import EarlyStopping, History, LambdaCallback, ModelCheckpoint
from .config import (
    ActiveSelectionConfig,
    CommonConfig,
    Config,
    InferenceConfig,
    KalmanConfig,
    ModelConfig,
    SolverGateConfig,
    SystemConfig,
    TrainingConfig,
    build_system,
)
from .inference import (
    InferenceStatistics,
    Prediction,
    Predictor,
    TimingBreakdown,
    latency_report,
)
from .kalman import KalmanFilter, KalmanState
from .losses import LOSSES, get_loss
from .pagerank_selector import select_samples, similarity_graph
from .quantization import (
    QuantizedParams,
    quantization_error,
    quantize_tree,
    quantized_apply,
)
from .solver_gate import GateConfig, GateStats, SolverGate
from .temporal_net import ResidualNet, SystemA, SystemB
from .trainer import Trainer, make_optimizer, make_windows, train_system_b

__all__ = [
    # config system
    "Config", "CommonConfig", "ModelConfig", "TrainingConfig",
    "InferenceConfig", "SystemConfig", "KalmanConfig", "SolverGateConfig",
    "ActiveSelectionConfig", "build_system",
    # losses / callbacks
    "LOSSES", "get_loss",
    "EarlyStopping", "ModelCheckpoint", "History", "LambdaCallback",
    # inference
    "Predictor", "Prediction", "TimingBreakdown", "InferenceStatistics",
    "latency_report",
    # quantization
    "QuantizedParams", "quantize_tree", "quantized_apply", "quantization_error",
    # solvers
    "KalmanFilter", "KalmanState",
    "SolverGate", "GateConfig", "GateStats",
    "select_samples", "similarity_graph",
    # models + training
    "SystemA", "SystemB", "ResidualNet",
    "Trainer", "make_optimizer", "make_windows", "train_system_b",
]
