"""Two-process CPU test of the multi-host (DCN) evaluation sweep driver.

Launches two real OS processes connected through ``jax.distributed``
(SURVEY §5.8), shards a 2-mesh dataset across them, and checks the merged
statistics yaml process 0 writes.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

from sdfest_tpu.pipeline.synthetic import save_obj

from test_eval_scripts import HAS_REFERENCE, _cube_mesh, _eval_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import yaml
from sdfest_tpu.parallel import distributed as dist
from sdfest_tpu.scripts.distributed_evaluation import run_distributed

dist.initialize_distributed({coord!r}, 2, int(sys.argv[1]))
with open({cfg!r}) as f:
    config = yaml.safe_load(f)
run_distributed(config)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference fixture unavailable")
def test_two_process_distributed_sweep(tmp_path):
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    v, f = _cube_mesh()
    save_obj(str(mesh_dir / "cube_a.obj"), v, f)
    save_obj(str(mesh_dir / "cube_b.obj"), v * 0.8, f)

    config = _eval_config(tmp_path, mesh_dir)
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(config, fh)

    coord = f"localhost:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    script = _WORKER.format(repo=REPO, coord=coord, cfg=str(cfg_path))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    # each process evaluated exactly its 1-mesh shard
    assert "evaluating 1 of 2 meshes" in outs[0]
    assert "evaluating 1 of 2 meshes" in outs[1]

    merged = [
        f
        for f in os.listdir(tmp_path / "results")
        if f.endswith("_merged.yaml")
    ]
    assert len(merged) == 1
    with open(tmp_path / "results" / merged[0]) as fh:
        results = yaml.safe_load(fh)["results"]
    stats = results[1]  # one-view sweep
    assert np.isfinite(stats["chamfer"]["mean"])
    # variance over 2 meshes is well-defined (both shards merged)
    assert stats["chamfer"]["var"] >= 0.0
    # partial dumps were cleaned up
    assert not any(
        f.endswith(".pkl") for f in os.listdir(tmp_path / "results")
    )


_CATEGORY_WORKER = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {testdir!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sdfest_tpu.parallel import distributed as dist
from sdfest_tpu.scripts.category_evaluation import CategoryEvaluator
from sdfest_tpu.scripts.distributed_evaluation import run_distributed_category
from test_eval_scripts import (
    _FakeCategoryDataset, _FakePipeline, _category_sample,
)

dist.initialize_distributed({coord!r}, 2, int(sys.argv[1]))
config = {{
    "dataset": "nocs", "gt_mesh_metric": False,
    "category_configs": {{"mug": None, "bowl": None}},
    "out_folder": {out!r}, "run_name": "cat", "samples": 100, "seed": 0,
    "metrics": {{}},
}}
dataset = _FakeCategoryDataset([
    _category_sample("mug"),
    _category_sample("bowl"),
    _category_sample("mug", position=(0.2, 0.0, 0.3)),
])
pipelines = {{
    "mug": _FakePipeline([0.0, 0.0, 0.3], [0.0, 0.0, 0.0, 1.0], 0.05),
    "bowl": _FakePipeline([0.0, 0.0, 0.3], [0.0, 0.0, 0.0, 1.0], 0.05),
}}
evaluator = CategoryEvaluator(config, dataset, pipelines)
run_distributed_category(config, evaluator)
"""


def test_two_process_category_sweep(tmp_path):
    """Category-mode sharding merges raw records exactly across processes."""
    out = str(tmp_path / "results")
    coord = f"localhost:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    testdir = os.path.join(REPO, "tests")
    script = _CATEGORY_WORKER.format(
        repo=REPO, testdir=testdir, coord=coord, out=out
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    assert "evaluating 2 of 3 samples" in outs[0]
    assert "evaluating 1 of 3 samples" in outs[1]

    merged = [f for f in os.listdir(out) if f.endswith("_merged.yaml")]
    assert len(merged) == 1
    with open(os.path.join(out, merged[0])) as fh:
        results = yaml.safe_load(fh)["results"]
    # 2 mug samples (one 0.2 m off -> every correctness entry fails for it)
    assert results["mug"]["count"] == 2
    assert results["bowl"]["count"] == 1
    assert results["all"]["count"] == 3
    assert results["mug"]["correctness"]["deg_cm_5deg_5cm"] == 0.5
    assert results["bowl"]["correctness"]["deg_cm_5deg_5cm"] == 1.0
    assert not any(f.endswith(".pkl") for f in os.listdir(out))
