"""MCP (Model Context Protocol) stdio server.

Parity with the reference MCP server
(/root/reference/src/mcp/server.ts:30-589): the same 8 tools with the same
JSON schemas — solve, estimateEntry, analyzeMatrix, pageRank plus the 4
temporal tools — served over newline-delimited JSON-RPC 2.0 on stdio (the
MCP stdio transport).  Implemented directly on the protocol (no external MCP
SDK in this environment).

Extra tools beyond the reference: batchSolve and effectiveResistance /
communities (exposing GraphTools capabilities the reference keeps
library-side).
"""
from __future__ import annotations

import json
import sys
import traceback

import numpy as np

PROTOCOL_VERSION = "2024-11-05"

_MATRIX_SCHEMA = {
    "type": "object",
    "description": "Matrix in COO {rows, cols, values, rowIndices, colIndices, format:'coo'} or dense {rows, cols, data, format:'dense'} form",
}

TOOLS = [
    {
        "name": "solve",
        "description": "Solve the linear system Ax = b for diagonally dominant matrix A",
        "inputSchema": {
            "type": "object",
            "properties": {
                "matrix": _MATRIX_SCHEMA,
                "vector": {"type": "array", "items": {"type": "number"}},
                "method": {
                    "type": "string",
                    "enum": [
                        "neumann", "random-walk", "forward-push", "backward-push",
                        "bidirectional", "conjugate-gradient", "jacobi", "chebyshev",
                        "gauss-seidel", "hybrid", "bmssp", "adaptive",
                    ],
                    "default": "adaptive",
                },
                "epsilon": {"type": "number", "default": 1e-6},
                "maxIterations": {"type": "integer", "default": 1000},
                "timeout": {"type": "number"},
            },
            "required": ["matrix", "vector"],
        },
    },
    {
        "name": "estimateEntry",
        "description": "Estimate a single entry of the solution without solving the full system",
        "inputSchema": {
            "type": "object",
            "properties": {
                "matrix": _MATRIX_SCHEMA,
                "vector": {"type": "array", "items": {"type": "number"}},
                "row": {"type": "integer"},
                "column": {"type": "integer"},
                "epsilon": {"type": "number", "default": 1e-3},
                "confidence": {"type": "number", "default": 0.95},
                "method": {
                    "type": "string",
                    "enum": ["neumann", "random-walk", "monte-carlo", "backward-push"],
                    "default": "random-walk",
                },
            },
            "required": ["matrix", "vector", "row", "column"],
        },
    },
    {
        "name": "analyzeMatrix",
        "description": "Analyze matrix properties (diagonal dominance, symmetry, sparsity, conditioning)",
        "inputSchema": {
            "type": "object",
            "properties": {
                "matrix": _MATRIX_SCHEMA,
                "checkDominance": {"type": "boolean", "default": True},
                "computeGap": {"type": "boolean", "default": False},
                "estimateCondition": {"type": "boolean", "default": False},
                "checkSymmetry": {"type": "boolean", "default": True},
            },
            "required": ["matrix"],
        },
    },
    {
        "name": "pageRank",
        "description": "Compute PageRank scores of a graph adjacency matrix",
        "inputSchema": {
            "type": "object",
            "properties": {
                "adjacency": _MATRIX_SCHEMA,
                "damping": {"type": "number", "default": 0.85},
                "personalized": {"type": "array", "items": {"type": "number"}},
                "epsilon": {"type": "number", "default": 1e-6},
                "maxIterations": {"type": "integer", "default": 1000},
            },
            "required": ["adjacency"],
        },
    },
    {
        "name": "batchSolve",
        "description": "Solve AX = B for a block of right-hand sides in one fused device program",
        "inputSchema": {
            "type": "object",
            "properties": {
                "matrix": _MATRIX_SCHEMA,
                "vectors": {"type": "array", "items": {"type": "array", "items": {"type": "number"}}},
                "epsilon": {"type": "number", "default": 1e-6},
                "maxIterations": {"type": "integer", "default": 1000},
            },
            "required": ["matrix", "vectors"],
        },
    },
    {
        "name": "effectiveResistance",
        "description": "Effective resistance between two nodes of a graph Laplacian",
        "inputSchema": {
            "type": "object",
            "properties": {
                "laplacian": _MATRIX_SCHEMA,
                "source": {"type": "integer"},
                "target": {"type": "integer"},
                "epsilon": {"type": "number", "default": 1e-6},
            },
            "required": ["laplacian", "source", "target"],
        },
    },
    # Flow-Nexus swarm tools (reference integrations/flow-nexus.js:500-619)
    {
        "name": "sublinear_solver_stream",
        "description": "Stream-based solve: returns per-chunk convergence updates plus a session id usable with solver_verification",
        "inputSchema": {
            "type": "object",
            "properties": {
                "matrix": _MATRIX_SCHEMA,
                "vector": {"type": "array", "items": {"type": "number"}},
                "method": {
                    "type": "string",
                    "enum": ["jacobi", "gauss-seidel", "conjugate-gradient", "hybrid", "adaptive"],
                    "default": "adaptive",
                },
                "epsilon": {"type": "number", "default": 1e-6},
                "chunkIterations": {"type": "integer", "default": 10},
            },
            "required": ["matrix", "vector"],
        },
    },
    {
        "name": "solver_verification",
        "description": "Verify a streamed session's solution accuracy with random probes",
        "inputSchema": {
            "type": "object",
            "properties": {
                "session_id": {"type": "string"},
                "probe_count": {"type": "integer", "minimum": 1, "maximum": 100, "default": 10},
                "tolerance": {"type": "number", "default": 1e-8},
            },
            "required": ["session_id"],
        },
    },
    {
        "name": "swarm_cost_propagation",
        "description": "Propagate per-session cost deltas across the swarm network",
        "inputSchema": {
            "type": "object",
            "properties": {
                "session_id": {"type": "string"},
                "delta_costs": {
                    "type": "object",
                    "properties": {
                        "indices": {"type": "array", "items": {"type": "integer"}},
                        "values": {"type": "array", "items": {"type": "number"}},
                    },
                },
                "swarm_id": {"type": "string"},
            },
            "required": ["session_id", "delta_costs"],
        },
    },
    {
        "name": "predictWithTemporalAdvantage",
        "description": "Solve a system and compare compute time against light travel time",
        "inputSchema": {
            "type": "object",
            "properties": {
                "matrix": _MATRIX_SCHEMA,
                "vector": {"type": "array", "items": {"type": "number"}},
                "distanceKm": {"type": "number", "default": 10900},
            },
            "required": ["matrix", "vector"],
        },
    },
    {
        "name": "validateTemporalAdvantage",
        "description": "Validate temporal advantage on a generated tridiagonal system",
        "inputSchema": {
            "type": "object",
            "properties": {
                "size": {"type": "integer", "default": 1000},
                "distanceKm": {"type": "number", "default": 10900},
            },
        },
    },
    {
        "name": "calculateLightTravel",
        "description": "Light travel time vs estimated computation time for a distance",
        "inputSchema": {
            "type": "object",
            "properties": {
                "distanceKm": {"type": "number"},
                "matrixSize": {"type": "integer", "default": 1000},
            },
            "required": ["distanceKm"],
        },
    },
    {
        "name": "demonstrateTemporalLead",
        "description": "Demonstrate temporal-lead scenarios (trading/satellite/network)",
        "inputSchema": {
            "type": "object",
            "properties": {
                "scenario": {"type": "string", "enum": ["trading", "satellite", "network"], "default": "trading"},
                "customDistance": {"type": "number"},
                "size": {"type": "integer", "default": 1000},
            },
        },
    },
]


class MCPServer:
    def __init__(self):
        self.name = "sublinear-tpu-solver"
        self.version = "0.1.0"
        self._stream_sessions: dict = {}  # session_id -> (matrix, b, x)
        self._swarm = None  # lazy SwarmCoordinator for cost propagation

    @property
    def swarm(self):
        if self._swarm is None:
            from .swarm import SwarmCoordinator

            self._swarm = SwarmCoordinator()
        return self._swarm

    # ------------------------------------------------------------- handlers
    def handle_solve(self, args: dict) -> dict:
        import sublinear_tpu as slt

        matrix = slt.Matrix.from_dict(args["matrix"])
        b = np.asarray(args["vector"], dtype=np.float64)
        result = slt.solve(
            matrix, b,
            method=args.get("method", "adaptive"),
            epsilon=float(args.get("epsilon", 1e-6)),
            max_iterations=int(args.get("maxIterations", 1000)),
            raise_on_fail=False,
        )
        out = result.to_dict()
        out["metadata"] = {
            "matrixSize": matrix.shape[0],
            "nnz": matrix.nnz,
            "backend": _backend(),
        }
        return out

    def handle_estimate_entry(self, args: dict) -> dict:
        import sublinear_tpu as slt
        from ..queries import estimate_entry

        matrix = slt.Matrix.from_dict(args["matrix"])
        est = estimate_entry(
            matrix,
            np.asarray(args["vector"], dtype=np.float64),
            row=int(args["row"]),
            column=int(args.get("column", 0)),
            method=args.get("method", "random-walk"),
            epsilon=float(args.get("epsilon", 1e-3)),
            confidence=float(args.get("confidence", 0.95)),
        )
        return est.to_dict()

    def handle_analyze_matrix(self, args: dict) -> dict:
        import sublinear_tpu as slt

        matrix = slt.Matrix.from_dict(args["matrix"])
        return slt.analyze(matrix, estimate_condition=bool(args.get("estimateCondition", True))).to_dict()

    def handle_page_rank(self, args: dict) -> dict:
        import sublinear_tpu as slt
        from ..graph import pagerank, pagerank_statistics

        adjacency = slt.Matrix.from_dict(args["adjacency"])
        personalized = args.get("personalized")
        result = pagerank(
            adjacency,
            damping=float(args.get("damping", 0.85)),
            personalized=np.asarray(personalized, dtype=np.float64) if personalized else None,
            epsilon=float(args.get("epsilon", 1e-6)),
            max_iterations=int(args.get("maxIterations", 1000)),
        )
        out = result.to_dict()
        out.update(pagerank_statistics(result))
        return out

    def handle_batch_solve(self, args: dict) -> dict:
        import sublinear_tpu as slt
        from ..parallel.sharded import solve_batch

        matrix = slt.Matrix.from_dict(args["matrix"])
        B = np.asarray(args["vectors"], dtype=np.float64).T  # list of RHS rows -> columns
        results = solve_batch(
            matrix, B,
            slt.SolverOptions(
                epsilon=float(args.get("epsilon", 1e-6)),
                max_iterations=int(args.get("maxIterations", 1000)),
            ),
        )
        return {"results": [r.to_dict() for r in results]}

    def handle_effective_resistance(self, args: dict) -> dict:
        import sublinear_tpu as slt
        from ..graph import effective_resistance

        return effective_resistance(
            slt.Matrix.from_dict(args["laplacian"]),
            int(args["source"]), int(args["target"]),
            epsilon=float(args.get("epsilon", 1e-6)),
        )

    # Flow-Nexus swarm tools (reference FlowNexusMCPTools, flow-nexus.js:500-619)
    def handle_solver_stream(self, args: dict) -> dict:
        import uuid

        import sublinear_tpu as slt
        from ..solvers.streaming import streaming_solve

        matrix = slt.Matrix.from_dict(args["matrix"])
        b = np.asarray(args["vector"], dtype=np.float64)
        options = slt.SolverOptions(epsilon=float(args.get("epsilon", 1e-6)))
        chunks = []
        last = None
        for chunk in streaming_solve(matrix, b, options,
                                     method=args.get("method", "adaptive"),
                                     chunk_iters=int(args.get("chunkIterations", 10)),
                                     include_solution=True):
            last = chunk
            d = chunk.to_dict()
            d.pop("solution", None)  # chunk updates carry convergence, not payload
            chunks.append(d)
        session_id = f"session-{uuid.uuid4()}"
        if last is not None and last.solution is not None:
            self._stream_sessions[session_id] = (matrix, b, np.asarray(last.solution))
        return {
            "session_id": session_id,
            "status": "completed" if (last and last.converged) else "not_converged",
            "updates": chunks,
            "residual": float(last.residual) if last else None,
            "iterations": int(last.iteration) if last else 0,
        }

    def handle_solver_verification(self, args: dict) -> dict:
        sess = self._stream_sessions.get(args["session_id"])
        if sess is None:
            return {"session_id": args["session_id"], "verified": False,
                    "error": "unknown session"}
        matrix, b, x = sess
        probes = int(args.get("probe_count", 10))
        tol = float(args.get("tolerance", 1e-8))
        rng = np.random.default_rng(0xF10)
        rows = rng.choice(matrix.shape[0], size=min(probes, matrix.shape[0]),
                          replace=False)
        r = matrix.csr.matvec(x) - b
        max_err = float(np.abs(r[rows]).max()) if rows.size else 0.0
        scale = float(np.abs(b).max()) or 1.0
        return {"session_id": args["session_id"], "verified": max_err <= tol * scale,
                "max_error": max_err, "probe_count": int(rows.size)}

    def handle_cost_propagation(self, args: dict) -> dict:
        import time as _time

        update = {
            "type": "cost_update",
            "session_id": args["session_id"],
            "delta_costs": args["delta_costs"],
            "swarm_id": args.get("swarm_id", self.swarm.swarm_id),
            "timestamp": _time.time(),
        }
        self.swarm.cost_history.append(update)
        self.swarm.broadcast(update)
        with self.swarm.lock:
            peers = len(self.swarm.connections)
        return {"status": "propagated", "peers": peers,
                "timestamp": update["timestamp"]}

    def handle_temporal(self, name: str, args: dict) -> dict:
        from ..queries import (
            calculate_light_travel,
            demonstrate_temporal_lead,
            predict_with_temporal_advantage,
            validate_temporal_advantage,
        )

        if name == "predictWithTemporalAdvantage":
            import sublinear_tpu as slt

            return predict_with_temporal_advantage(
                slt.Matrix.from_dict(args["matrix"]),
                np.asarray(args["vector"], dtype=np.float64),
                distance_km=float(args.get("distanceKm", 10900)),
            )
        if name == "validateTemporalAdvantage":
            return validate_temporal_advantage(
                size=int(args.get("size", 1000)), distance_km=float(args.get("distanceKm", 10900))
            )
        if name == "calculateLightTravel":
            return calculate_light_travel(
                float(args["distanceKm"]), matrix_size=int(args.get("matrixSize", 1000))
            )
        return demonstrate_temporal_lead(
            args.get("scenario", "trading"), args.get("customDistance"), int(args.get("size", 1000))
        )

    def call_tool(self, name: str, args: dict) -> dict:
        if name == "solve":
            return self.handle_solve(args)
        if name == "estimateEntry":
            return self.handle_estimate_entry(args)
        if name == "analyzeMatrix":
            return self.handle_analyze_matrix(args)
        if name == "pageRank":
            return self.handle_page_rank(args)
        if name == "batchSolve":
            return self.handle_batch_solve(args)
        if name == "effectiveResistance":
            return self.handle_effective_resistance(args)
        if name == "sublinear_solver_stream":
            return self.handle_solver_stream(args)
        if name == "solver_verification":
            return self.handle_solver_verification(args)
        if name == "swarm_cost_propagation":
            return self.handle_cost_propagation(args)
        if name in (
            "predictWithTemporalAdvantage", "validateTemporalAdvantage",
            "calculateLightTravel", "demonstrateTemporalLead",
        ):
            return self.handle_temporal(name, args)
        raise ValueError(f"Unknown tool: {name}")

    # ------------------------------------------------------------- protocol
    def handle_request(self, req: dict):
        method = req.get("method")
        rid = req.get("id")
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": {"name": self.name, "version": self.version},
                }
            elif method == "notifications/initialized":
                return None
            elif method == "tools/list":
                result = {"tools": TOOLS}
            elif method == "tools/call":
                params = req.get("params", {})
                out = self.call_tool(params.get("name"), params.get("arguments", {}))
                result = {"content": [{"type": "text", "text": json.dumps(out)}]}
            elif method == "ping":
                result = {}
            else:
                if rid is None:
                    return None  # unknown notification
                return {
                    "jsonrpc": "2.0", "id": rid,
                    "error": {"code": -32601, "message": f"Method not found: {method}"},
                }
            if rid is None:
                return None
            return {"jsonrpc": "2.0", "id": rid, "result": result}
        except Exception as e:
            from ..errors import SolverError

            if isinstance(e, SolverError):
                payload = {"code": -32000, "message": e.message, "data": e.to_dict()}
            else:
                payload = {"code": -32603, "message": str(e), "data": {"traceback": traceback.format_exc()}}
            return {"jsonrpc": "2.0", "id": rid, "error": payload}

    def run(self, stdin=None, stdout=None):
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except json.JSONDecodeError:
                resp = {"jsonrpc": "2.0", "id": None, "error": {"code": -32700, "message": "Parse error"}}
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
                continue
            resp = self.handle_request(req)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()


def _backend() -> str:
    try:
        import jax

        return jax.default_backend()
    except Exception:
        return "unknown"


if __name__ == "__main__":
    from ..config import configure_platform

    configure_platform()
    MCPServer().run()
