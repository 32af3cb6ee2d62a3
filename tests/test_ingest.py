"""Real-video ingest pipeline, executed end-to-end (VERDICT r2 item 3).

Covers the previously never-run edge of the data layer:
  cv2 video fixtures -> decode_video -> build_cache -> pack_directory ->
  PackedVideoDataset -> BatchLoader -> 10+ real CLI train iterations;
  plus MSRVDC CSV ingest (data/mrvdc.py), the CIFAR-10 batches reader
  (data/cifar10.py) + an img-GAN CLI run over it, the reddit JSON converter,
  the 80/20 splitter, and the Loader's bounded decode-ahead.

Reference pipeline: create_cache_2.py:52-73, mrvdc/read_data.py:36-105,
data/__init__.py:372-383, reddit_videos_json_to_pickle.py, split.py.
"""

import json
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from txt2vid_tpu.data import (Loader, VideoDataset, build_vocab, get_loader,
                              transform_frames)
from txt2vid_tpu.data.cache import build_cache, decode_video
from txt2vid_tpu.data.packed import PackedVideoDataset, pack_directory


def write_avi(path, num_frames=40, size=48, value_step=5, codec="XVID"):
    """Frames with constant value t*value_step so decoded content is checkable."""
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*codec), 8.0, (size, size))
    assert w.isOpened()
    for t in range(num_frames):
        w.write(np.full((size, size, 3), min(t * value_step, 255), np.uint8))
    w.release()


@pytest.fixture(scope="module")
def video_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("ingest")
    vdir = root / "videos"
    vdir.mkdir()
    captions = {}
    for i in range(7):
        write_avi(vdir / f"vid{i}.avi", num_frames=40)
        captions[f"vid{i}"] = [f"digit {i} is left and right."]
    write_avi(vdir / "vid7.mp4", num_frames=40, codec="mp4v")
    captions["vid7"] = ["digit 7 is up and down."]
    with open(root / "sent.pickle", "wb") as f:
        pickle.dump(captions, f)
    vocab = build_vocab([s for v in captions.values() for s in v])
    with open(root / "vocab.pickle", "wb") as f:
        pickle.dump(vocab, f)
    return root, vdir, captions, vocab


class TestDecodeAndCache:
    def test_decode_video(self, video_fixture):
        _, vdir, _, _ = video_fixture
        frames = decode_video(vdir / "vid1.avi")
        assert frames.shape == (40, 48, 48, 3) and frames.dtype == np.uint8
        # codec is lossy, but constant-value frames survive approximately
        assert abs(int(frames[0].mean()) - 0) <= 6
        assert abs(int(frames[20].mean()) - 100) <= 6
        resized = decode_video(vdir / "vid7.mp4", size=32)
        assert resized.shape == (40, 32, 32, 3)

    def test_build_cache_and_video_dataset(self, video_fixture, tmp_path):
        root, vdir, captions, vocab = video_fixture
        cache = tmp_path / "cache"
        results = build_cache(vdir, cache, size=32, num_frames=16, workers=2)
        assert sum(1 for _, ok in results if ok) == 8
        arr = np.load(cache / "vid2.npy")
        assert arr.shape == (16, 32, 32, 3) and arr.dtype == np.uint8
        # evenly spaced from 40 frames: stride 2 -> values 0,10,20,...
        assert abs(int(arr[1].mean()) - 10) <= 6

        dset = VideoDataset(video_dir=cache, vocab=vocab, captions=captions,
                            num_frames=8, frame_size=32, num_channels=1)
        assert len(dset) == 8 and dset.missing == 0
        frames, caption = dset[0]
        assert frames.shape == (8, 32, 32, 1)
        assert -1.0 <= frames.min() and frames.max() <= 1.0
        assert caption is not None and len(caption) > 3

    def test_pack_and_batch_loader(self, video_fixture, tmp_path):
        root, vdir, captions, vocab = video_fixture
        cache = tmp_path / "cache"
        build_cache(vdir, cache, size=32, num_frames=16, workers=2)
        packed = tmp_path / "videos.t2vc"
        id_map = pack_directory(cache, packed)
        assert len(id_map) == 8

        dset = PackedVideoDataset(packed, vocab=vocab, captions=captions,
                                  num_frames=8, frame_size=32, num_channels=1)
        loader = get_loader(dset=dset, batch_size=2, num_workers=2,
                            has_captions=True)
        batches = list(loader)
        assert len(batches) == 4
        b = batches[0]
        assert b["video"].shape == (2, 8, 32, 32, 1)
        assert b["captions"].shape[0] == 2 and b["lengths"].min() > 0
        # packed gather content == per-item dataset content
        item0, _ = dset[0]
        direct = dset.get_batch(np.asarray([0, 3]), 32)
        np.testing.assert_allclose(direct["video"][0], item0, atol=1e-6)


class TestRealVideoTrainCLI:
    def test_train_cli_on_decoded_videos(self, video_fixture, tmp_path):
        """The full production path: cv2 decode -> cache -> pack -> 12 CLI train
        iterations of conditional TGANv2 on CPU."""
        root, vdir, captions, vocab = video_fixture
        cache = tmp_path / "cache"
        build_cache(vdir, cache, size=32, num_frames=16, workers=2)
        packed = tmp_path / "videos.t2vc"
        pack_directory(cache, packed)

        from txt2vid_tpu.train.gan import build_parser, main
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
            "--G", gen_spec, "--D", dis_spec, "--dont_use_sent",
            "--data", data_spec, "--anno", str(root / "sent.pickle"),
            "--frame_sizes", "8", "16", "--subsample_input", "--num_channels", "1",
            "--D_loss", "txt2vid_tpu.gan.losses.RSGANLoss",
            "--batch_size", "8", "--epochs", "12", "--seed", "7",
            "--log_period", "5", "--save_model_period", "10",
            "--save_example_period", "10", "--workers", "2",
            "--out", str(out), "--out_samples", str(out / "samples")])
        main(args)
        ckpts = list(out.glob("iter_*"))
        assert ckpts, "no checkpoint written by the CLI run"
        assert list((out / "samples").glob("**/*.png")), "no samples written"

        # --test sampling mode on the produced checkpoint (trainer.test():
        # each round consumes a fresh batch; consistent per-round naming)
        tdir = tmp_path / "test_samples"
        targs = build_parser().parse_args([
            "--G", gen_spec, "--D", dis_spec, "--dont_use_sent",
            "--data", data_spec, "--anno", str(root / "sent.pickle"),
            "--frame_sizes", "8", "16", "--num_channels", "1",
            "--D_loss", "txt2vid_tpu.gan.losses.RSGANLoss",
            "--batch_size", "8", "--seed", "7", "--workers", "2",
            "--test", "--num_samples", "2",
            "--weights", str(sorted(ckpts)[-1]),
            "--out", str(out), "--out_samples", str(tdir)])
        main(targs)
        names = sorted(f.name for f in tdir.iterdir())
        assert "real_0.png" in names and "real_1.png" in names
        assert any(n.startswith("fake_0_") for n in names)
        assert any(n.startswith("fake_1_") for n in names)


class TestMrvdc:
    def test_read_csv_filters(self, tmp_path):
        from txt2vid_tpu.data.mrvdc import read_csv
        vdir = tmp_path / "clips"
        vdir.mkdir()
        write_avi(vdir / "vidA_0_10.avi", num_frames=40)   # ok
        write_avi(vdir / "vidB_5_9.avi", num_frames=8)     # too few frames
        # vidC missing on disk
        rows = [
            ("vidA", 0, 10, "English", "a person cooks pasta."),
            ("vidA", 0, 10, "English", "someone is cooking."),
            ("vidA", 0, 10, "Spanish", "una persona cocina."),          # language
            ("vidA", 0, 10, "English", "x" * 80),                       # too long
            ("vidB", 5, 9, "English", "should be dropped (frames)."),
            ("vidC", 1, 2, "English", "missing clip."),
        ]
        csv = tmp_path / "MSR.csv"
        with open(csv, "w") as f:
            f.write("VideoID,Start,End,Language,Description\n")
            for vid, s, e, lang, desc in rows:
                f.write(f'{vid},{s},{e},{lang},"{desc}"\n')
        result = read_csv(csv, video_dir=vdir, check_frames=True)
        assert set(result) == {"vidA_0_10"}
        assert result["vidA_0_10"] == ["a person cooks pasta.", "someone is cooking."]
        # without a video dir nothing is dropped for existence
        result2 = read_csv(csv)
        assert set(result2) == {"vidA_0_10", "vidB_5_9", "vidC_1_2"}


class TestCifar10:
    @pytest.fixture()
    def cifar_dir(self, tmp_path):
        rng = np.random.default_rng(2)
        bd = tmp_path / "cifar-10-batches-py"
        bd.mkdir()
        for name, n in [("data_batch_1", 20), ("data_batch_2", 20),
                        ("test_batch", 10)]:
            data = rng.integers(0, 256, (n, 3072), dtype=np.uint8)
            with open(bd / name, "wb") as f:
                pickle.dump({b"data": data, b"labels": [0] * n}, f)
        return tmp_path

    def test_dataset(self, cifar_dir):
        from txt2vid_tpu.data.cifar10 import Cifar10Dataset
        d = Cifar10Dataset(cifar_dir, train=True)
        assert len(d) == 40
        img, cap = d[0]
        assert img.shape == (32, 32, 3) and cap is None
        assert -1.0 <= img.min() and img.max() <= 1.0
        # pad-to-64 path (torchvision CenterCrop pad semantics)
        d64 = Cifar10Dataset(cifar_dir, train=True, frame_size=64)
        img64, _ = d64[0]
        assert img64.shape == (64, 64, 3)
        assert np.all(img64[:16] == -1.0)  # zero-pixel padding normalizes to -1
        np.testing.assert_allclose(img64[16:48, 16:48], img, atol=1e-6)
        d_test = Cifar10Dataset(cifar_dir, train=False)
        assert len(d_test) == 10

    def test_img_gan_cli_on_cifar10(self, cifar_dir, tmp_path):
        """config/cifar10.json-shaped data spec driving the img WGAN-GP pair
        (reference run_tgan.sh cifar10 variant; data/__init__.py:372-374)."""
        from txt2vid_tpu.train.gan import build_parser, main
        out = tmp_path / "out"
        gen_spec = json.dumps({"class": "txt2vid_tpu.models.img.Gen",
                               "args": {"dim": 8}})
        dis_spec = json.dumps({"class": "txt2vid_tpu.models.img.Discrim",
                               "args": {"dim": 8}})
        data_spec = json.dumps({
            "class": "txt2vid_tpu.data.cifar10_dataset",
            "args": {"data": str(cifar_dir), "frame_size": 64}})
        args = build_parser().parse_args([
            "--G", gen_spec, "--D", dis_spec, "--dont_use_sent", "--img_model",
            "--data_is_imgs",
            "--data", data_spec,
            "--frame_sizes", "64", "--num_channels", "3",
            "--D_loss", "txt2vid_tpu.gan.losses.WassersteinGanLoss",
            "--discrim_steps", "2", "--gp_lambda", "10",
            "--batch_size", "8", "--epochs", "1", "--seed", "3",
            "--log_period", "5", "--save_model_period", "5",
            "--save_example_period", "10", "--workers", "2",
            "--out", str(out), "--out_samples", str(out / "samples")])
        main(args)
        assert list(out.glob("iter_*")), "no checkpoint written"


class TestSideTools:
    def test_reddit_json_to_pickle(self, tmp_path):
        from txt2vid_tpu.data.reddit import convert, url_to_key
        entries = [{"url": "https://v.redd.it/abc?x=1", "title": "a cat jumps"},
                   {"url": "https://v.redd.it/abc?x=1", "title": "same video"},
                   {"url": "https://v.redd.it/def.mp4", "title": "a dog runs"}]
        jp = tmp_path / "scraped.json"
        with open(jp, "w") as f:
            json.dump(entries, f)
        result = convert(jp, tmp_path / "caps.pickle")
        assert len(result) == 2
        key = url_to_key("https://v.redd.it/abc?x=1")
        assert result[key] == ["a cat jumps", "same video"]
        with open(tmp_path / "caps.pickle", "rb") as f:
            assert pickle.load(f) == result

    def test_split_80_20(self, tmp_path):
        from txt2vid_tpu.data.split import split
        src = tmp_path / "src"
        src.mkdir()
        for i in range(10):
            (src / f"v{i}.npy").write_bytes(b"x")
        n_train, n_val = split(src, tmp_path / "train", tmp_path / "val")
        assert (n_train, n_val) == (8, 2)
        assert len(list((tmp_path / "train").iterdir())) == 8
        assert len(list((tmp_path / "val").iterdir())) == 2


class TestLoaderBackpressure:
    def test_bounded_decode_ahead(self):
        """A slow consumer must never have more than num_workers+1 decoded plus
        device_prefetch+1 transferred batches materialized (VERDICT r2 weak #2)."""
        import threading

        lock = threading.Lock()
        state = {"decoded": 0, "consumed": 0, "max_ahead": 0}

        class CountingDataset:
            def __len__(self):
                return 64

            def __getitem__(self, idx):
                with lock:
                    state["decoded"] += 1
                return np.zeros((2, 4, 4, 1), np.float32), None

        workers, prefetch = 2, 1
        loader = Loader(CountingDataset(), batch_size=4, num_workers=workers,
                        device_prefetch=prefetch, to_device=False)
        bound = (workers + 1) + (prefetch + 1)
        for batch in loader:
            with lock:
                state["consumed"] += 4
                ahead = state["decoded"] - state["consumed"]
                state["max_ahead"] = max(state["max_ahead"], ahead)
        # items decoded ahead of consumption, in batches
        assert state["max_ahead"] <= bound * 4, state
