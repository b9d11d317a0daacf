"""Multi-process (DCN-path) smoke test: parallel/distributed.py end to end.

Round-2 VERDICT missing #5: `initialize()` / `make_global_mesh` /
`per_host_batch_size` had never executed under jax.process_count() > 1.
This test spawns TWO local CPU processes that form a real
jax.distributed cluster (coordinator on localhost), build the global
mesh (2 procs x 2 virtual devices = 4), construct a process-local-sharded
global batch, and run one shard_map DP train step — the exact code path a
multi-host TPU pod would run, minus the DCN wires. Both processes must
report identical (pmean-replicated) metrics.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")

import json
import sys

port, pid = sys.argv[1], int(sys.argv[2])

from music2dance_tpu.parallel.distributed import (
    initialize,
    make_global_mesh,
    per_host_batch_size,
)

initialize(coordinator_address=f"localhost:{port}", num_processes=2,
           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 4

from jax.sharding import NamedSharding, PartitionSpec as P

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.parallel.dp import shard_train_step
from music2dance_tpu.train import TrainConfig, init_state

mesh = make_global_mesh()
assert mesh.size == 4

audio = AudioConfig(sample_rate=8000, n_fft=256, win_length=256,
                    hop_length=200, n_mels=40, n_mfcc=13)
layout = JointLayout(n_joints=4, joint_dim=3)
gan = tiny_gan(feature_dim=audio.n_mfcc, layout=layout)
tc = TrainConfig(batch_size=8)
local_b = per_host_batch_size(tc.batch_size)
assert local_b == 4

# both processes draw the SAME global batch from the same key, then keep
# their process-local rows — the multi-host input-pipeline contract
full = synthetic_batch(jax.random.key(0), tc.batch_size, 0.5, audio, layout,
                       through_frontend=False)
import numpy as np
local = {k: np.asarray(v)[pid * local_b : (pid + 1) * local_b]
         for k, v in full.items()}
batch_sharding = NamedSharding(mesh, P("data"))
gbatch = {
    k: jax.make_array_from_process_local_data(batch_sharding, v)
    for k, v in local.items()
}

# identical params from the same seed on every process, then assembled
# into fully-replicated GLOBAL arrays (device_put cannot target
# non-addressable devices; make_array_from_process_local_data can)
state = init_state(jax.random.key(1), gan, tc, full)
rep = NamedSharding(mesh, P())


def to_global(x):
    if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        return jax.random.wrap_key_data(
            jax.make_array_from_process_local_data(rep, data)
        )
    return jax.make_array_from_process_local_data(rep, np.asarray(x))


state = jax.tree.map(to_global, state)

step = shard_train_step(gan, tc, mesh, donate=False)
state, metrics = step(state, gbatch)
out = {k: float(v) for k, v in metrics.items()}
out["step"] = int(state.step)
print("RESULT " + json.dumps(out, sort_keys=True), flush=True)
"""


_TP_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")

import json
import sys

import numpy as np

port, pid = sys.argv[1], int(sys.argv[2])

from music2dance_tpu.parallel.distributed import initialize

initialize(coordinator_address=f"localhost:{port}", num_processes=2,
           process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 4

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.parallel.tp import tp_shardings, tp_train_step
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

# 2-D global mesh: data axis ACROSS the two processes (DCN on a real
# pod), model axis across each process's local devices (ICI)
grid = np.asarray(jax.devices()).reshape(2, 2)
mesh = Mesh(grid, ("data", "model"))

audio = AudioConfig(sample_rate=8000, n_fft=256, win_length=256,
                    hop_length=200, n_mels=40, n_mfcc=13)
layout = JointLayout(n_joints=4, joint_dim=3)
gan = tiny_gan(feature_dim=audio.n_mfcc, layout=layout)
tc = TrainConfig(batch_size=8)

full = synthetic_batch(jax.random.key(0), tc.batch_size, 0.5, audio, layout,
                       through_frontend=False)
state = init_state(jax.random.key(1), gan, tc, full)

# single-device reference on this host's CPU: the distributed TP step
# must match it to reduction-order tolerance
ref_state, ref_metrics = jax.jit(make_train_step(gan, tc))(state, full)
ref = {k: float(v) for k, v in ref_metrics.items()}

shardings = tp_shardings(state, mesh)


def to_global(x, sh):
    if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        return jax.random.wrap_key_data(
            jax.make_array_from_process_local_data(sh, data)
        )
    return jax.make_array_from_process_local_data(sh, np.asarray(x))


gstate = jax.tree.map(to_global, state, shardings)
local_b = tc.batch_size // 2
bsh = NamedSharding(mesh, P("data"))
gbatch = {
    k: jax.make_array_from_process_local_data(
        bsh, np.asarray(v)[pid * local_b : (pid + 1) * local_b])
    for k, v in full.items()
}

fn, gstate = tp_train_step(gan, tc, mesh, gstate, donate=False, place=False)
gstate, metrics = fn(gstate, gbatch)
out = {k: float(v) for k, v in metrics.items()}
out["step"] = int(gstate.step)
out["ref_" + "step"] = 1
for k, v in ref.items():
    out["ref_" + k] = v
print("RESULT " + json.dumps(out, sort_keys=True), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_workers(tmp_path, source):
    worker = tmp_path / "worker.py"
    worker.write_text(source)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=repo,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-2000:]}\n{err[-2000:]}"
        outs.append(json.loads(lines[-1][len("RESULT "):]))
    return outs


def test_two_process_distributed_train_step(tmp_path):
    a, b = _run_two_workers(tmp_path, _WORKER)
    assert a["step"] == b["step"] == 1
    for k in a:
        assert np.isfinite(a[k]), (k, a[k])
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)


def test_two_process_tensor_parallel_step(tmp_path):
    """DCN x model-parallel composition: a (data=2 processes, model=2
    local devices) GSPMD mesh; each worker also runs the single-device
    step locally and the distributed TP metrics must match it."""
    a, b = _run_two_workers(tmp_path, _TP_WORKER)
    assert a["step"] == b["step"] == 1
    for k in list(a):
        assert np.isfinite(a[k]), (k, a[k])
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)
    for k in a:
        if k.startswith("ref_") or k == "step":
            continue
        np.testing.assert_allclose(
            a[k], a["ref_" + k], rtol=2e-3, atol=5e-5,
            err_msg=f"TP-over-2-processes vs single device: {k}",
        )
