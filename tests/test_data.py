"""Data-layer tests: Vocab tokenizer semantics, frame picking, collate, synthetic
generator, dataset + loader round trip."""

import numpy as np
import pytest

from txt2vid_tpu.data import (
    Vocab, build_vocab, pick_frames, encode_caption, collate, VideoDataset, Loader)
from txt2vid_tpu.data.synthetic import generate_examples


class TestVocab:
    def test_specials(self):
        v = Vocab()
        assert v(v.PAD) == 0
        assert v("never-seen") == v(v.UNKNOWN)
        assert len(v) == 4

    def test_tokenize_trailing_period(self):
        # reference data/__init__.py:299-306: trailing '.' becomes <end>
        v = Vocab()
        toks = list(v.tokenize("digit 9 is left and right."))
        assert toks == ["<start>", "digit", "9", "is", "left", "and", "right", "<end>"]

    def test_lowercase(self):
        v = build_vocab(["Hello World."])
        assert v("hello") == v("HELLO")
        assert v("hello") != v(v.UNKNOWN)

    def test_to_words_roundtrip(self):
        v = build_vocab(["digit 3 is top and bottom."])
        ids = encode_caption(v, "digit 3 is top and bottom.")
        words = v.to_words(ids)
        assert "digit 3 is top and bottom" in words

    def test_encode_appends_end(self):
        v = build_vocab(["a b"])
        ids = encode_caption(v, "a b")  # no trailing period
        assert ids[-1] == v(v.END)


class TestPickFrames:
    def test_even(self):
        idx = pick_frames(64, 16)
        assert len(idx) == 16
        assert list(idx[:3]) == [0, 4, 8]

    def test_exact(self):
        assert list(pick_frames(16, 16)) == list(range(16))

    def test_random_sorted(self):
        idx = pick_frames(64, 16, random=True, rng=np.random.default_rng(0))
        assert len(idx) == 16 and all(np.diff(idx) > 0)


class TestCollate:
    def test_pads_static(self):
        v = build_vocab(["a b c d e.", "a."])
        items = [
            (np.zeros((4, 8, 8, 1), np.float32), encode_caption(v, "a b c d e.")),
            (np.zeros((4, 8, 8, 1), np.float32), encode_caption(v, "a.")),
        ]
        batch = collate(items, max_caption_len=12)
        assert batch["video"].shape == (2, 4, 8, 8, 1)
        assert batch["captions"].shape == (2, 12)
        assert batch["lengths"].tolist() == [7, 3]
        assert batch["captions"][1, 3:].sum() == 0  # padded with <pad>=0

    def test_uncond(self):
        items = [(np.zeros((4, 8, 8, 1), np.float32), None)]
        batch = collate(items)
        assert set(batch.keys()) == {"video"}


class TestSyntheticAndDataset:
    @pytest.fixture(scope="class")
    def synth(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("synth")
        sent_map = generate_examples(root / "videos", root / "sent.pickle",
                                     num_examples=6, frame_size=(32, 32),
                                     num_frames=32, seed=7)
        return root, sent_map

    def test_generator_output(self, synth):
        root, sent_map = synth
        assert len(sent_map) == 6
        arr = np.load(root / "videos" / "0.npy")
        assert arr.shape == (32, 32, 32, 1) and arr.dtype == np.uint8
        assert arr.max() > 0  # digit actually rendered
        sent = sent_map[0][0]
        assert sent.startswith("digit ") and sent.endswith(".")
        # motion: the digit should not stay in one place
        assert (arr[0] != arr[16]).any()

    def test_dataset_and_loader(self, synth):
        root, sent_map = synth
        vocab = build_vocab([s for v in sent_map.values() for s in v])
        dset = VideoDataset(video_dir=root / "videos", vocab=vocab,
                            captions=root / "sent.pickle", num_frames=8,
                            frame_size=32, num_channels=1)
        assert len(dset) == 6
        frames, caption = dset[0]
        assert frames.shape == (8, 32, 32, 1)
        assert frames.min() >= -1.0 and frames.max() <= 1.0
        assert caption[0] == vocab(vocab.START)

        loader = Loader(dset, batch_size=2, num_workers=2, max_caption_len=10, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert np.asarray(b["video"]).shape == (2, 8, 32, 32, 1)
        assert np.asarray(b["captions"]).shape == (2, 10)

    def test_missing_videos_skipped(self, synth, tmp_path):
        root, sent_map = synth
        caps = dict(sent_map)
        caps["nonexistent"] = ["ghost video."]
        vocab = build_vocab(["x."])
        dset = VideoDataset(video_dir=root / "videos", vocab=vocab, captions=caps,
                            num_frames=8, frame_size=32, num_channels=1)
        assert dset.missing == 1 and len(dset) == 6
