"""Device-resident dataset (data/device_cache.py): one-time HBM upload +
in-step batch assembly, and the --device_data CLI path end-to-end on the
8-virtual-device CPU mesh."""

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from txt2vid_tpu.data import build_vocab
from txt2vid_tpu.data.device_cache import DeviceVideoData
from txt2vid_tpu.data.packed import write_packed_cache


@pytest.fixture(scope="module")
def packed_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("devdata")
    rng = np.random.default_rng(0)
    vids = {}
    captions = {}
    for i in range(10):
        # frame t has mean i*20+t so gather results are checkable
        arr = np.clip(rng.integers(0, 5, (8, 16, 16, 1))
                      + np.arange(8)[:, None, None, None]
                      + i * 20, 0, 255).astype(np.uint8)
        vids[f"v{i}"] = arr
        captions[f"v{i}"] = [f"digit {i % 10} is left and right."]
    packed = root / "videos.t2vc"
    write_packed_cache(iter(vids.items()), packed,
                       str(packed.with_suffix(".ids.pickle")))
    with open(root / "sent.pickle", "wb") as f:
        pickle.dump(captions, f)
    vocab = build_vocab([s for v in captions.values() for s in v])
    with open(root / "vocab.pickle", "wb") as f:
        pickle.dump(vocab, f)
    return root, packed, captions, vocab, vids


class TestDeviceVideoData:
    def test_from_packed_and_host_batch(self, packed_fixture):
        root, packed, captions, vocab, vids = packed_fixture
        d = DeviceVideoData.from_packed(packed, captions=captions, vocab=vocab,
                                        num_frames=4, num_channels=1)
        assert d.videos.shape == (10, 8, 16, 16, 1)
        assert d.num_pairs == 10
        hb = d.host_batch(np.array([0, 3]))
        assert hb["video"].shape == (2, 4, 16, 16, 1)
        assert hb["video"].dtype == np.uint8
        # evenly-spaced stride-2 pick: frames 0, 2, 4, 6
        np.testing.assert_array_equal(hb["video"][0], d.videos[d.vid_idx[0], ::2])
        assert hb["captions"].shape[0] == 2 and hb["lengths"].min() > 0

    def test_assemble_under_jit(self, packed_fixture):
        root, packed, captions, vocab, vids = packed_fixture
        from txt2vid_tpu.parallel.mesh import make_mesh
        d = DeviceVideoData.from_packed(packed, captions=captions, vocab=vocab,
                                        num_frames=4, num_channels=1)
        mesh = make_mesh(n_devices=8)
        arrays = d.device_arrays(mesh)

        @jax.jit
        def draw(key):
            return d.assemble(arrays, key, batch_size=8)

        b1 = draw(jax.random.key(0))
        b2 = draw(jax.random.key(1))
        assert b1["video"].shape == (8, 4, 16, 16, 1)
        assert b1["video"].dtype == jnp.uint8
        assert b1["captions"].shape == (8, 32)
        # different keys draw different batches
        assert not np.array_equal(np.asarray(b1["video"]),
                                  np.asarray(b2["video"]))
        # each drawn video matches its host row (video means identify the row)
        v = np.asarray(b1["video"])
        means = v.mean(axis=(1, 2, 3, 4))
        host_means = d.videos[:, ::2].mean(axis=(1, 2, 3, 4))
        for m in means:
            assert np.min(np.abs(host_means - m)) < 1e-5

    def test_random_phase(self, packed_fixture):
        root, packed, captions, vocab, vids = packed_fixture
        d = DeviceVideoData.from_packed(packed, captions=captions, vocab=vocab,
                                        num_frames=4, num_channels=1,
                                        random_phase=True)
        arrays = d.device_arrays()

        @jax.jit
        def draw(key):
            return d.assemble(arrays, key, batch_size=4)["video"]

        # over many keys, both phases (0 and 1) of the stride-2 grid must occur;
        # frame values encode the temporal index so phase is recoverable
        phases = set()
        for k in range(8):
            v = np.asarray(draw(jax.random.key(k)), np.int64)
            rel = (v[0, 1] - v[0, 0]).mean()  # stride step is always 2
            first = v[0, 0].mean() % 20       # offset within the video: t + noise
            phases.add(int(round(first)) % 2)
            assert abs(rel - 2) < 0.5
        assert phases == {0, 1}


class TestDeviceDataCLI:
    def test_train_cli_device_data(self, packed_fixture, tmp_path):
        from txt2vid_tpu.train.gan import build_parser, main
        root, packed, captions, vocab, vids = packed_fixture
        out = tmp_path / "out"
        gen_spec = json.dumps({
            "class": "txt2vid_tpu.models.tganv2.MultiScaleGen",
            "args": {"latent_size": 8, "width": 16, "height": 16,
                     "num_channels": 1, "fm_channels": 8,
                     "additional_blocks": [8], "num_frames": 4,
                     "use_pallas": False}})
        dis_spec = json.dumps({
            "class": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim",
            "args": {"discrim_down_blocks": [1, 1], "num_channels": 1,
                     "with_attn": False, "use_pallas": False}})
        data_spec = json.dumps({
            "class": "txt2vid_tpu.data.packed.packed_dataset",
            "args": {"data": str(packed), "num_frames": 4, "num_channels": 1}})
        args = build_parser().parse_args([
            "--G", gen_spec, "--D", dis_spec, "--dont_use_sent", "--device_data",
            "--data", data_spec, "--anno", str(root / "sent.pickle"),
            "--frame_sizes", "8", "16", "--subsample_input", "--num_channels", "1",
            "--D_loss", "txt2vid_tpu.gan.losses.RSGANLoss",
            "--batch_size", "8", "--epochs", "10", "--seed", "5",
            "--clip_grad", "10.0",
            "--log_period", "5", "--save_model_period", "8",
            "--save_example_period", "8",
            "--out", str(out), "--out_samples", str(out / "samples")])
        main(args)
        assert list(out.glob("iter_*")), "no checkpoint written"
        assert list((out / "samples").glob("**/*.png")), "no samples written"
