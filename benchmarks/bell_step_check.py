"""On-device A/B of the fused blocked-ELL SpMM kernels: ONE plain and ONE
masked sharded ALS step with the Pallas kernels (default) vs the XLA tile
formulation (SINGLET_TPU_BELL_KERNELS=0), same inputs. A single step has no
chaotic CD amplification, so any divergence is the kernels' own — expected
bound ~1e-5 relative (fp reassociation of the Bw 256-cell partial sums).

Run: python benchmarks/bell_step_check.py
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, sys
sys.path.insert(0, %(root)r)
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/singlet_tpu_jax_cache")
import jax.numpy as jnp
import scipy.sparse as sp
from singlet_tpu.ops.rngmask import seed_pair
from singlet_tpu.parallel.sharded import make_mesh
from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

rng = np.random.default_rng(11)
A = sp.random(1024, 2048, density=0.1, random_state=2, dtype=np.float32,
              format="csc")
A.data = np.abs(A.data) + 0.1
eng = ShardedEllEngine(A, mesh=make_mesh(1))
k = 8
plain_step, masked_step, _ = eng.steps(6)
W, H, args, _ = eng._state(k, rng.random((1024, k)).astype(np.float32), 0)
f32 = jnp.float32
Wp, Hp, dp, tp = plain_step(*args, W, H, f32(0.01), f32(0.01), f32(0.0),
                            f32(0.0), f32(1e9))
Wm, Hm, dm, tm = masked_step(*args, W, H, seed_pair(5), f32(0.01), f32(0.01),
                             f32(0.0), f32(0.0), jnp.int32(k), f32(1e9))
np.savez(sys.argv[1], Wp=np.asarray(Wp), Hp=np.asarray(Hp),
         dp=np.asarray(dp), Wm=np.asarray(Wm), Hm=np.asarray(Hm),
         dm=np.asarray(dm))
print("worker done", flush=True)
"""


def main():
    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER % {"root": root}
    outs = {}
    for tag, env_val in (("kernel", "1"), ("xla", "0")):
        out = f"/tmp/bell_step_{tag}.npz"
        env = dict(os.environ, SINGLET_TPU_BELL_KERNELS=env_val)
        subprocess.run([sys.executable, "-c", script, out], check=True,
                       env=env, timeout=1500)
        outs[tag] = np.load(out)

    res = {"metric": "bell_kernel_step_divergence"}
    ok = True
    for key in ("Wp", "Hp", "dp", "Wm", "Hm", "dm"):
        a, b = outs["kernel"][key], outs["xla"][key]
        d = float(np.max(np.abs(a - b) / (np.abs(b) + 1e-6)))
        res[key] = d
        ok &= d < 1e-4
    res["ok"] = ok
    print(json.dumps(res))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
