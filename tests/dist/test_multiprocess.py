"""Two-process jax.distributed smoke test on localhost (SURVEY.md section 5;
slow-marked: spawns subprocesses with their own JAX runtimes)."""

import os
import pathlib
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:19761",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.dist.data_parallel import count_errors_sharded, decode_batch_sharded
from turbotpu.dist.mesh import make_mesh
from turbotpu.dist.multihost import host_local_batch, make_global_array

mesh = make_mesh(data=8, seq=1)
K, Bg = 40, 16
Bl = host_local_batch(Bg)
rng = np.random.default_rng(proc_id)
mk = lambda *s: np.asarray(rng.normal(size=s), np.float32)
args = [make_global_array(mk(Bl, K), mesh) for _ in range(3)]
tails = [make_global_array(mk(Bl, 6), mesh) for _ in range(2)]
decode = decode_batch_sharded(mesh, DecoderConfig(K=K, n_iters=2))
hard, iters, L = decode(*args, *tails)
count = count_errors_sharded(mesh)
ref = make_global_array(np.zeros((Bl, K), np.int8), mesh)
bit, frame = count(hard, ref)
print("RESULT", proc_id, int(bit), int(frame), flush=True)

# Seq-parallel on a 2x4 mesh over both processes: each process holds one
# 'data' row (its seq ppermutes stay local), and the per-iteration global
# early-exit psum over 'data' crosses the process boundary -- the
# multi-host analog of the lockstep-exit rule in dist/seq_parallel.py.
# PRODUCTION path: Pallas NII chunk kernel + merged-gather exchange with
# int8 payloads (round 4) -- not the scan oracle.
from turbotpu.dist.seq_parallel import decode_seq_sharded
mesh2 = make_mesh(data=2, seq=4)
dec2 = decode_seq_sharded(mesh2, DecoderConfig(K=K, n_iters=2,
                                               early_term="crc",
                                               siso="pallas", nii=True,
                                               io_dtype="bfloat16",
                                               ext_dtype="int8"))
args2 = [make_global_array(mk(Bl, K), mesh2) for _ in range(3)]
tails2 = [make_global_array(mk(Bl, 6), mesh2) for _ in range(2)]
hard2, iters2, L2 = dec2(*args2, *tails2)
bit2, frame2 = count_errors_sharded(mesh2)(hard2, make_global_array(
    np.zeros((Bl, K), np.int8), mesh2))
print("RESULT2", proc_id, int(bit2), int(frame2), flush=True)

# The SCAN chunk path too (round-4 review: it now routes garbage
# extrinsics through real_len exchange tables and must keep cross-process
# coverage -- its collective sequence differs from the cells path).
dec3 = decode_seq_sharded(mesh2, DecoderConfig(K=K, n_iters=2,
                                               early_term="crc",
                                               siso="scan"))
hard3, _, _ = dec3(*args2, *tails2)
bit3, frame3 = count_errors_sharded(mesh2)(hard3, make_global_array(
    np.zeros((Bl, K), np.int8), mesh2))
print("RESULT3", proc_id, int(bit3), int(frame3), flush=True)
"""


# Sweep worker for the supervised-relaunch test: a 2-process group where
# process 1 SIGKILLs ITSELF (exact own PID) after the first grid point on
# the first group launch only (marker file), simulating a host loss.
_SWEEP_WORKER = r"""
import os, pathlib, signal, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
results = sys.argv[2]
marker = pathlib.Path(sys.argv[3])
port = sys.argv[4]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=proc_id)
from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.harness.ber import SimConfig, simulate_ber, simulate_point, make_step

cfg = SimConfig(name="sup", K=40, B=8, ebn0_db_grid=(8.0, 9.0, 10.0, 11.0),
                decoder=DecoderConfig(K=40, n_iters=2), use_crc=False,
                min_frame_errors=1, max_frames=16, seed=3)
# Each process runs the (tiny) sweep; process 0 owns the results file.
step = make_step(cfg)
import json, pathlib as pl
done = set()
p = pl.Path(results)
if p.exists():
    for line in p.read_text().splitlines():
        try: done.add(json.loads(line)["ebn0_db"])
        except Exception: pass
for i, ebn0 in enumerate(cfg.ebn0_db_grid):
    if float(ebn0) in done:
        continue
    rec = simulate_point(cfg, float(ebn0), step)
    if proc_id == 0:
        with p.open("a") as f:
            f.write(json.dumps(rec) + "\n")
    if proc_id == 1 and i == 0 and not marker.exists():
        marker.write_text("died once")
        os.kill(os.getpid(), signal.SIGKILL)   # exact own PID
"""


def test_supervised_group_relaunch(tmp_path):
    """VERDICT item 10: kill one member of a 2-process sweep group mid-run;
    the supervisor fails fast, kills the survivor by exact PID, relaunches
    the group, and the sweep completes from the JSONL checkpoint."""
    from turbotpu.harness.supervisor import supervise
    worker = tmp_path / "sweep.py"
    worker.write_text(_SWEEP_WORKER)
    results = tmp_path / "r.jsonl"
    marker = tmp_path / "fault_injected"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(pathlib.Path(__file__).parents[2]) + os.pathsep + \
        env.get("PYTHONPATH", "")
    argvs = [[sys.executable, str(worker), str(i), str(results),
              str(marker), "19773"] for i in range(2)]
    restarts = supervise(argvs, max_restarts=2, env=env,
                         results_path=str(results), verbose=False)
    assert restarts == 1, restarts
    assert marker.exists()
    lines = results.read_text().splitlines()
    import json
    pts = {json.loads(l)["ebn0_db"] for l in lines}
    assert pts == {8.0, 9.0, 10.0, 11.0}


def test_two_process_localhost(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(pathlib.Path(__file__).parents[2]) + os.pathsep + \
        env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    for tag in ("RESULT ", "RESULT2 ", "RESULT3 "):
        results = sorted(line for out in outs for line in out.splitlines()
                         if line.startswith(tag))
        assert len(results) == 2, results
        # Both processes must observe identical global psum counts.
        a = results[0].split()[2:]
        b = results[1].split()[2:]
        assert a == b
