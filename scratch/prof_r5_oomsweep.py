"""Find (G, nb) staging widths that compile for a given geometry via the
solver chunked path, and their device times."""
import os, sys, importlib
import numpy as np

sys.path.insert(0, "/root/repo")

def trial(G, NB, n=10_000, d=1e-3):
    os.environ["SLT_XBAR_G1"] = str(G)
    os.environ["SLT_XBAR_NB"] = str(NB)
    import jax, jax.numpy as jnp
    import sublinear_tpu as slt
    A = slt.generate("random-sparse", n, seed=7, density=d)
    b = slt.rhs(n, seed=7)
    try:
        r = slt.solve(A, b, method="neumann", epsilon=1e-6)
        rel = float(np.linalg.norm(A.csr.matvec(r.solution) - b) / np.linalg.norm(b))
        return f"ok rel={rel:.1e}"
    except Exception as e:
        s = str(e)
        return "VMEM-OOM" if ("vmem" in s or "500" in s) else ("FAIL " + s[:80])

if __name__ == "__main__":
    G, NB = int(sys.argv[1]), int(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    d = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-3
    print(f"G={G} NB={NB} n={n}: {trial(G, NB, n, d)}")
