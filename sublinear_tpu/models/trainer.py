"""Training loop for the temporal micro-nets.

Reference: /root/reference/neural-network-implementation/src/training/
(Trainer, optimizer, losses, callbacks).

TPU design: optax optimizer, one jitted train_step (donated state), data
parallel over the mesh ``batch`` axis — batches are placed with a
NamedSharding and GSPMD partitions the step; gradients reduce over the mesh
automatically.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .temporal_net import SystemA


@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0


class Trainer:
    def __init__(self, model: SystemA, window: int, features: int = 1,
                 learning_rate: float = 1e-3, seed: int = 0):
        self.model = model
        self.tx = optax.adam(learning_rate)
        params = model.init(jax.random.PRNGKey(seed), jnp.zeros((window, features)))
        self.state = TrainState(params, self.tx.init(params))

        def loss_fn(params, windows, targets):
            preds = jax.vmap(lambda w: model.apply(params, w))(windows)
            return jnp.mean((preds - targets) ** 2)

        def train_step(params, opt_state, windows, targets):
            loss, grads = jax.value_and_grad(loss_fn)(params, windows, targets)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._loss_fn = jax.jit(loss_fn)

    def fit(self, windows: np.ndarray, targets: np.ndarray, epochs: int = 10,
            batch_size: int = 64, mesh=None, seed: int = 0) -> list:
        """windows: (N, T, F); targets: (N, horizon)."""
        windows = jnp.asarray(np.asarray(windows, dtype=np.float32))
        targets = jnp.asarray(np.asarray(targets, dtype=np.float32))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import BATCH

            sh = NamedSharding(mesh, P(BATCH))
            windows = jax.device_put(windows, sh)
            targets = jax.device_put(targets, sh)

        n = windows.shape[0]
        rng = np.random.default_rng(seed)
        history = []
        for _ in range(epochs):
            order = rng.permutation(n)
            epoch_loss = 0.0
            batches = 0
            for start in range(0, n - batch_size + 1, batch_size):
                idx = jnp.asarray(order[start : start + batch_size])
                bw, bt = windows[idx], targets[idx]
                self.state.params, self.state.opt_state, loss = self._train_step(
                    self.state.params, self.state.opt_state, bw, bt
                )
                self.state.step += 1
                epoch_loss += float(loss)
                batches += 1
            history.append(epoch_loss / max(batches, 1))
        return history

    def evaluate(self, windows, targets) -> float:
        return float(
            self._loss_fn(
                self.state.params,
                jnp.asarray(np.asarray(windows, dtype=np.float32)),
                jnp.asarray(np.asarray(targets, dtype=np.float32)),
            )
        )

    def predict(self, window) -> np.ndarray:
        return np.asarray(
            self.model.apply(self.state.params, jnp.asarray(np.asarray(window, dtype=np.float32)))
        )

    def save(self, path: str):
        """Persist parameters (flax msgpack serialization)."""
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.state.params))

    def load(self, path: str):
        from flax import serialization

        with open(path, "rb") as f:
            self.state.params = serialization.from_bytes(self.state.params, f.read())


def load_series_csv(path: str, column: int | str = -1, skip_header: bool = True) -> np.ndarray:
    """CSV time-series loader (reference: neural-network-implementation
    src/data CSV loader).  Returns one column as a float32 series."""
    import csv

    with open(path) as f:
        reader = csv.reader(f)
        rows = list(reader)
    if not rows:
        return np.zeros(0, dtype=np.float32)
    header = rows[0]
    if isinstance(column, str):
        idx = header.index(column)
        rows = rows[1:]
    else:
        idx = column if column >= 0 else len(rows[-1]) + column
        if skip_header:
            try:
                float(rows[0][idx])
            except (ValueError, IndexError):
                rows = rows[1:]
    return np.asarray([float(r[idx]) for r in rows if r], dtype=np.float32)


def make_windows(series: np.ndarray, window: int, horizon: int = 1):
    """Sliding-window dataset from a 1-D series (data/ loader equivalent)."""
    series = np.asarray(series, dtype=np.float32).reshape(-1)
    N = series.size - window - horizon + 1
    windows = np.stack([series[i : i + window] for i in range(N)])[:, :, None]
    targets = np.stack([series[i + window : i + window + horizon] for i in range(N)])
    return windows, targets
