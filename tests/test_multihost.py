"""Multi-host readiness (SURVEY.md §2.8 DCN row; VERDICT r3 item 3): the REAL
training CLI runs as TWO coordinated jax processes on the CPU backend — a local
coordinator, 4 virtual devices per process, one global dp=8 mesh — with
per-process data feeding (ShardedView + make_array_from_process_local_data in
prefetch_to_mesh) and process-0-only checkpoint writes.

No TPU pod is needed: jax.distributed over localhost is the same code path a
pod slice takes (there the coordinator is auto-discovered). Both processes must
report IDENTICAL losses — the batch is assembled from per-process shards into
one global array, so training math is exactly the single-process math.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest


WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
import runpy, sys
sys.argv = ["gan"] + sys.argv[1:]
runpy.run_module("txt2vid_tpu.train.gan", run_name="__main__")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def tiny_videos(tmp_path_factory):
    from txt2vid_tpu.data.synthetic import generate_examples

    root = tmp_path_factory.mktemp("mh")
    # 32px source frames (the glyph needs >=28px); the loader's frame_size=16
    # resizes down to the model's input
    generate_examples(str(root / "videos"), str(root / "sent.pickle"),
                      num_examples=16, frame_size=(32, 32), num_frames=4,
                      seed=11)
    return root


class TestShardedView:
    def test_strided_split_item_level(self):
        from txt2vid_tpu.data import ShardedView

        base = list(range(10))
        v0 = ShardedView(base, 0, 2)
        v1 = ShardedView(base, 1, 2)
        assert len(v0) == len(v1) == 5
        assert [v0[i] for i in range(5)] == [0, 2, 4, 6, 8]
        assert [v1[i] for i in range(5)] == [1, 3, 5, 7, 9]
        # item-level base: get_batch must NOT exist (get_loader dispatches
        # BatchLoader on hasattr)
        assert not hasattr(v0, "get_batch")

    def test_batch_level_index_translation(self):
        import numpy as np

        from txt2vid_tpu.data import ShardedView

        class Base:
            def __len__(self):
                return 8

            def get_batch(self, idxs, cap=32):
                return {"idxs": np.asarray(idxs), "cap": cap}

        v = ShardedView(Base(), 1, 2)
        out = v.get_batch([0, 2], 16)
        assert out["idxs"].tolist() == [1, 5] and out["cap"] == 16


class TestMultihost:
    def test_two_process_cpu_training(self, tiny_videos, tmp_path):
        port = _free_port()
        out = tmp_path / "out"
        data = ('{"class": "txt2vid_tpu.data.my_dataset", "args": '
                '{"data": "%s", "num_frames": 4, "frame_size": 16}}'
                % (tiny_videos / "videos"))
        gspec = ('{"class": "txt2vid_tpu.models.tganv2.MultiScaleGen", "args": '
                 '{"latent_size": 16, "width": 16, "height": 16, '
                 '"num_channels": 1, "fm_channels": 16, "additional_blocks": '
                 '[8], "num_frames": 4, "use_pallas": false}}')
        dspec = ('{"class": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim", '
                 '"args": {"discrim_down_blocks": [1, 1], "num_channels": 1, '
                 '"use_pallas": false}}')
        flags = [
            "--G", gspec, "--D", dspec, "--data", data, "--dont_use_sent",
            "--anno", str(tiny_videos / "sent.pickle"),
            "--frame_sizes", "8", "16", "--subsample_input",
            "--num_channels", "1",
            "--D_loss", "txt2vid_tpu.gan.losses.RSGANLoss",
            # global batch 8 -> 4 per process; 8 local items -> 2 steps/epoch
            "--batch_size", "8", "--epochs", "1", "--seed", "5",
            "--log_period", "1", "--save_model_period", "2",
            "--save_example_period", "2", "--save_initial_examples",
            "--workers", "1",
            "--out", str(out), "--out_samples", str(out / "samples"),
            "--multihost", "--coordinator", f"127.0.0.1:{port}",
            "--num_processes", "2",
        ]
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=4"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
        env.pop("JAX_PLATFORMS", None)
        procs = []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, "-c", WORKER] + flags + ["--process_id",
                                                          str(pid)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=str(Path(__file__).resolve().parent.parent)))
        outs = []
        for pid, p in enumerate(procs):
            try:
                stdout, _ = p.communicate(timeout=1500)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(stdout)
            assert p.returncode == 0, f"process {pid} failed:\n{stdout[-4000:]}"

        # both processes saw the GLOBAL device set and ran the same iterations
        for pid, text in enumerate(outs):
            assert "process %d/2, 4 local of 8 devices" % pid in text, \
                text[-2000:]
            assert "feeds 8 items, 4/8 of each global batch" in text
        # losses are computed on the globally-assembled batch: identical
        # status lines on every process (replicated metrics)
        loss_lines = [re.findall(r"Iter \d+, Loss_D: [\d.]+ Loss_G: [\d.]+",
                                 text) for text in outs]
        assert loss_lines[0] and loss_lines[0] == loss_lines[1], loss_lines
        # process-0-only writes: exactly one writer of checkpoints/samples ran,
        # and the trail restores
        ckpts = [f for f in os.listdir(out) if f.startswith("iter_")]
        assert len(ckpts) >= 1, os.listdir(out)
        # multihost disables in-loop sample dumps (host-sharded batches)
        assert "multihost: in-loop sample dumps disabled" in outs[0]
        assert not list((out / "samples").glob("*.png"))
