"""Multi-host (DCN) scaffolding smoke test (VERDICT r2 item 10): a REAL
2-process jax.distributed cluster (gloo CPU collectives), each process holding
2 virtual devices, trains one sharded step on a 4-device global mesh with
per-process data loading (ProcessShardedLoader) — the pod-slice execution
model at laptop scale. Collectives cross the process boundary, so both
processes must report the identical global loss and confusion-matrix total.
"""
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import numpy as np
from unet_tpu import parallel
from unet_tpu.data.loader import Loader
from unet_tpu.models import SimpleUNet
from unet_tpu.train import LossCfg, OptimCfg, create_train_state, make_eval_step, make_train_step

idx, cnt = parallel.multihost.initialize(f"localhost:{port}", 2, pid)
assert (idx, cnt) == (pid, 2), (idx, cnt)
mesh = parallel.make_mesh(n_data=4, n_spatial=1)

class DS:
    def __len__(self):
        return 8
    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return (r.random((16, 16, 3), np.float32),
                (r.random((16, 16)) * 3).astype(np.int32))

loader = parallel.multihost.ProcessShardedLoader(Loader(DS(), 4, shuffle=True, prefetch=0))
assert loader.local_batch == 2 and len(loader) == 2

model = SimpleUNet(num_classes=3)
state = create_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3),
                           OptimCfg(total_steps=10))
train_step = parallel.shard_train_step(make_train_step(LossCfg()), mesh, spatial=False)
eval_step = parallel.shard_eval_step(make_eval_step(3), mesh, spatial=False)
for images, labels in loader:
    assert images.shape[0] == 2  # local slice of the global batch of 4
    im, lb = parallel.put_batch(mesh, images, labels, spatial=False)
    assert im.shape[0] == 4      # global array spans both processes
    state, metrics = train_step(state, im, lb)
    cm = np.asarray(eval_step(state, im, lb))
    print(f"RESULT pid={pid} loss={float(metrics['loss']):.6f} cm={int(cm.sum())}",
          flush=True)
"""


@pytest.mark.slow
def test_two_process_cluster_trains(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    env = {"PYTHONPATH": str(Path(__file__).resolve().parent.parent),
           "PATH": "/usr/bin:/bin", "HOME": "/root"}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert len(lines) == 2, out  # 2 global batches (8 samples / batch 4)
        pid = lines[0].split("pid=")[1].split()[0]
        results[pid] = lines
    # the global loss and psum'd confusion total must be identical across
    # processes — proof the collectives actually spanned the cluster
    assert results["0"] == [l.replace("pid=1", "pid=0") for l in results["1"]]
    for line in results["0"]:
        assert "cm=1024" in line  # 4 frames x 16 x 16 pixels, none lost
