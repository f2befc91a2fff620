"""Multi-host (DCN) path: 2-process jax.distributed on localhost.

Round-1 VERDICT #9: ``parallel.distributed.initialize_distributed`` had no
coverage at all.  This spawns two real processes (4 virtual CPU devices
each), joins them through a localhost coordinator, and runs a pjit-compiled
global-batch InfoNCE-style computation over the 8-device mesh — the exact
collective pattern pod-slice scale-out uses (SURVEY §5.8), with the batch
sharded across processes and the similarity matmul forcing the cross-host
all-gather.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_CODE = """
import os
import jax
jax.config.update('jax_platforms', 'cpu')

from transformer_clip_eeg_tpu.parallel.distributed import initialize_distributed

ok = initialize_distributed('localhost:{port}', 2, {pid})
assert ok, 'initialize_distributed returned False'

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from transformer_clip_eeg_tpu.parallel.mesh import make_mesh

mesh = make_mesh()  # 8-way 'data' axis spanning both processes
sharding = NamedSharding(mesh, P('data'))

B, D = 16, 4
full = np.arange(B * D, dtype=np.float32).reshape(B, D) + 1.0


def cb(index):
    return full[index]


arr = jax.make_array_from_callback((B, D), sharding, cb)


@jax.jit
def global_infonce_stat(x):
    xn = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T  # needs the cross-process all-gather
    return jnp.sum(sims)


val = float(global_infonce_stat(arr))
xn = full / np.linalg.norm(full, axis=1, keepdims=True)
expected = float((xn @ xn.T).sum())
assert abs(val - expected) < 1e-3, (val, expected)
print(f'WORKER_{pid}_OK', val)
"""


@pytest.mark.slow
def test_two_process_distributed_global_infonce():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_CODE.format(port=port, pid=pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        assert f"WORKER_{pid}_OK" in out
    # both processes computed the same replicated global statistic
    v0 = float(outs[0][1].split("WORKER_0_OK")[1].split()[0])
    v1 = float(outs[1][1].split("WORKER_1_OK")[1].split()[0])
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
