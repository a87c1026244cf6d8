"""Multi-host (multi-process) runtime: 2-process CPU smoke.

The reference's distributed story is a dormant DDP wrap plus an eval-frame
all_gather (nerf/utils.py:248-250, 1144-1155).  parallel/distributed.py
makes it real; this test proves the wiring with TWO actual OS processes
joined through `jax.distributed` (Gloo collectives on CPU):

  * process group forms (process_count == 2, 2×2 = 4 global devices)
  * a jitted psum over the cross-process global mesh produces the right
    global sum on both ranks
  * `gather_frames` round-trips per-rank frames in rank order
  * Trainer rank guards: the primary writes log/config/tensorboard files,
    rank 1 writes none

The worker runs in subprocesses (jax.distributed can only initialize once
per process); the parent asserts on their printed results.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

from dreamfusion_tpu.parallel import distributed as dist

assert dist.maybe_initialize_from_env(), "DFTPU_COORDINATOR env not honored"
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pid = dist.process_index()
assert dist.process_count() == 2, dist.process_count()
devs = jax.devices()
assert len(devs) == 4, f"expected 4 global devices, got {len(devs)}"
assert len(jax.local_devices()) == 2

# cross-process global mesh + jitted reduction
mesh = Mesh(np.array(devs).reshape(-1), ("data",))
sh = NamedSharding(mesh, P("data"))
from jax.experimental import multihost_utils
local = np.full((2, 4), float(pid + 1), np.float32)
garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
total = jax.jit(lambda x: x.sum(), in_shardings=sh,
                out_shardings=NamedSharding(mesh, P()))(garr)
print(f"RESULT psum {pid} {float(total)}", flush=True)

# frame gather in rank order (reference nerf/utils.py:1144-1155)
frames = np.full((2, 3, 3), pid, np.float32)
g = dist.gather_frames(frames)
print(f"RESULT gather {pid} {g.shape[0]} {g[0].mean():.0f} {g[-1].mean():.0f}",
      flush=True)

# Trainer rank guards: only rank 0 writes host-side files (per-rank
# workspace dirs so rank 1 can't see rank 0's writes)
ws = os.path.join(%(ws)r, f"proc{pid}")
from dreamfusion_tpu.config import Config, finalize
from dreamfusion_tpu.training.trainer import Trainer
cfg = finalize(Config(text="x", workspace=ws, backbone="triplane",
                      triplane_resolution=16, triplane_channels=4,
                      hidden_dim=16, num_layers=2, bg_radius=-1,
                      w=8, h=8, H=8, W=8, iters=2, seed=0,
                      eval_interval=-1, use_tensorboard=True))
tr = Trainer(cfg, guidances={}, guidance_params={}, embeddings={})
tr.log(f"hello from rank {pid}")
wrote_log = (os.path.exists(tr.log_path)
             and "hello" in open(tr.log_path).read())
wrote_cfg = os.path.exists(os.path.join(ws, "config.json"))
wrote_tb = tr.tb_writer is not None
print(f"RESULT guards {pid} log={wrote_log} cfg={wrote_cfg} tb={wrote_tb}",
      flush=True)
dist.sync()
print(f"RESULT done {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_group(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO, "ws": str(tmp_path / "ws")})
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   DFTPU_COORDINATOR=f"127.0.0.1:{port}",
                   DFTPU_NUM_PROCESSES="2",
                   DFTPU_PROCESS_ID=str(pid))
        env.pop("XLA_FLAGS", None)
        # stderr kept SEPARATE: the C++ AOT-spam stream is unbuffered and
        # once spliced itself into the middle of a buffered RESULT line
        # when merged via STDOUT (flake: 'too many values to unpack')
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs, errs = zip(*(p.communicate(timeout=600) for p in procs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"rank {pid} failed:\n{out[-2000:]}\n{errs[pid][-2000:]}"
        assert f"RESULT done {pid}" in out, \
            out[-2000:] + "\n" + errs[pid][-2000:]

    def result(out, tag, pid):
        for line in out.splitlines():
            if line.startswith(f"RESULT {tag} {pid}"):
                return line.split()[3:]
        raise AssertionError(f"no RESULT {tag} in rank {pid}:\n{out[-2000:]}")

    # psum: 2 rows*4 cols*(1) from rank0 + 2*4*(2) from rank1 = 24
    for pid in range(2):
        assert float(result(outs[pid], "psum", pid)[0]) == 24.0
    # gather: 4 frames, rank-major (first mean 0, last mean 1)
    for pid in range(2):
        n, first, last = result(outs[pid], "gather", pid)
        assert (int(n), float(first), float(last)) == (4, 0.0, 1.0)
    # rank guards: primary writes, secondary doesn't
    g0 = result(outs[0], "guards", 0)
    g1 = result(outs[1], "guards", 1)
    assert g0 == ["log=True", "cfg=True", "tb=True"], g0
    assert g1 == ["log=False", "cfg=False", "tb=False"], g1
