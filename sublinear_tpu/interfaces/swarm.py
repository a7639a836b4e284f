"""Swarm coordination: multi-worker job distribution + cost-update aggregation.

Parity: the Flow-Nexus swarm client
(/root/reference/integrations/flow-nexus.js:5-619 — registerSolver, joinSwarm,
cost-update propagation/aggregation :188-343, heartbeat/exponential-backoff
reconnect :344-405).  The reference talks to an external SaaS; here the swarm
is self-hosted: a coordinator tracks solver workers, aggregates per-worker
cost updates, and routes jobs to the cheapest worker.  Workers are HTTP
solver servers (interfaces/http_server.py) or in-process callables.

For a TPU deployment this is the *control plane*; the data plane (collective
compute) is `parallel/` — SURVEY.md §2.7 maps Flow-Nexus cost propagation to
multi-host collective updates.
"""
from __future__ import annotations

import dataclasses
import json
import threading
import time
import urllib.request
import uuid
from typing import Optional


@dataclasses.dataclass
class WorkerInfo:
    id: str
    endpoint: Optional[str]  # http base url, or None for in-process
    capabilities: dict
    cost: float = 1.0
    last_heartbeat: float = 0.0
    jobs_done: int = 0
    alive: bool = True


class SwarmCoordinator:
    """Tracks workers, aggregates cost updates, routes solve jobs."""

    def __init__(self, heartbeat_timeout: float = 30.0):
        self.swarm_id = str(uuid.uuid4())
        self.workers: dict[str, WorkerInfo] = {}
        self.cost_history: list[dict] = []
        self.heartbeat_timeout = heartbeat_timeout
        self.lock = threading.Lock()

    # ----------------------------------------------------------- lifecycle
    def register(self, endpoint: Optional[str] = None, capabilities: Optional[dict] = None) -> WorkerInfo:
        """registerSolver (flow-nexus.js:30)."""
        w = WorkerInfo(
            id=str(uuid.uuid4()),
            endpoint=endpoint,
            capabilities=capabilities or {"methods": ["all"]},
            last_heartbeat=time.time(),
        )
        with self.lock:
            self.workers[w.id] = w
        return w

    def heartbeat(self, worker_id: str):
        with self.lock:
            if worker_id in self.workers:
                self.workers[worker_id].last_heartbeat = time.time()
                self.workers[worker_id].alive = True

    def reap(self):
        now = time.time()
        with self.lock:
            for w in self.workers.values():
                if now - w.last_heartbeat > self.heartbeat_timeout:
                    w.alive = False

    # ----------------------------------------------------------- costs
    def update_cost(self, worker_id: str, cost: float, metadata: Optional[dict] = None):
        """cost_update message (flow-nexus.js:188-343)."""
        with self.lock:
            if worker_id not in self.workers:
                raise KeyError(f"unknown worker {worker_id}")
            self.workers[worker_id].cost = float(cost)
            self.cost_history.append({
                "type": "cost_update",
                "swarmId": self.swarm_id,
                "workerId": worker_id,
                "cost": float(cost),
                "metadata": metadata or {},
                "timestamp": time.time(),
            })

    def aggregate_costs(self) -> dict:
        with self.lock:
            alive = [w for w in self.workers.values() if w.alive]
            costs = [w.cost for w in alive]
        return {
            "swarmId": self.swarm_id,
            "workers": len(alive),
            "minCost": min(costs) if costs else None,
            "maxCost": max(costs) if costs else None,
            "meanCost": sum(costs) / len(costs) if costs else None,
            "updates": len(self.cost_history),
        }

    # ----------------------------------------------------------- routing
    def pick_worker(self) -> Optional[WorkerInfo]:
        self.reap()
        with self.lock:
            alive = [w for w in self.workers.values() if w.alive]
        return min(alive, key=lambda w: w.cost) if alive else None

    def submit(self, payload: dict, timeout: float = 300.0) -> dict:
        """Route a solve job to the cheapest alive worker."""
        w = self.pick_worker()
        if w is None:
            raise RuntimeError("no alive workers in swarm")
        t0 = time.time()
        if w.endpoint is None:
            result = _solve_local(payload)
        else:
            req = urllib.request.Request(
                w.endpoint.rstrip("/") + "/api/v1/solve",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                result = json.loads(resp.read())
        wall = time.time() - t0
        with self.lock:
            w.jobs_done += 1
        # cost model: recent latency EWMA (the reference propagates solve costs)
        self.update_cost(w.id, 0.7 * w.cost + 0.3 * wall, {"lastWallSec": wall})
        result["workerId"] = w.id
        return result


def _solve_local(payload: dict) -> dict:
    import numpy as np

    import sublinear_tpu as slt

    matrix = slt.Matrix.from_dict(payload["matrix"])
    b = np.asarray(payload["vector"], dtype=np.float64)
    r = slt.solve(matrix, b, method=payload.get("method", "adaptive"),
                  epsilon=float(payload.get("epsilon", 1e-6)), raise_on_fail=False)
    return r.to_dict()


class SwarmWorker:
    """Client-side handle: register + heartbeat loop (flow-nexus.js:344-405)."""

    def __init__(self, coordinator: SwarmCoordinator, endpoint: Optional[str] = None,
                 capabilities: Optional[dict] = None, heartbeat_interval: float = 5.0):
        self.coordinator = coordinator
        self.info = coordinator.register(endpoint, capabilities)
        self.heartbeat_interval = heartbeat_interval
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start_heartbeat(self):
        def loop():
            while not self._stop.wait(self.heartbeat_interval):
                self.coordinator.heartbeat(self.info.id)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
