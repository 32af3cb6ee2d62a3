"""CLI-level tests: sample.py and eval/run.py drive a checkpoint end-to-end with tiny
components on CPU."""

import json
import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from txt2vid_tpu.data import build_vocab
from txt2vid_tpu.data.synthetic import generate_examples
from txt2vid_tpu.gan.cond_gan import CondGan
from txt2vid_tpu.gan.train_step import TrainConfig, init_state
from txt2vid_tpu.models import tganv2
from txt2vid_tpu.models.txt import Seq2Seq
from txt2vid_tpu.utils.checkpoint import save_state
from txt2vid_tpu.utils.misc import load_pickle


GEN_SPEC = json.dumps({
    "class": "txt2vid_tpu.models.tganv2.MultiScaleGen",
    "args": {"latent_size": 8, "width": 16, "height": 16, "num_channels": 1,
             "fm_channels": 8, "additional_blocks": [8], "num_frames": 4,
             "use_pallas": False}})
DIS_SPEC = json.dumps({
    "class": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim",
    "args": {"discrim_down_blocks": [1, 1], "num_channels": 1,
             "with_attn": False, "use_pallas": False}})
SENT_SPEC = json.dumps({
    "class": "txt2vid_tpu.models.txt.Seq2Seq",
    "args": {"embed_size": 8, "hidden_size": 16, "num_layers": 1}})


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    sents = generate_examples(root / "videos", root / "sent.pickle",
                              num_examples=8, frame_size=(32, 32), num_frames=8,
                              seed=5)
    vocab = build_vocab([s for v in sents.values() for s in v])
    import pickle
    with open(root / "vocab.pickle", "wb") as f:
        pickle.dump(vocab, f)

    enc = Seq2Seq(vocab_size=len(vocab), embed_size=8, hidden_size=16, num_layers=1)
    gen = tganv2.MultiScaleGen(latent_size=8, width=16, height=16, num_channels=1,
                               fm_channels=8, additional_blocks=(8,), num_frames=4,
                               cond_dim=16, use_pallas=False)
    discrim = tganv2.MultiScaleDiscrim(discrim_down_blocks=(1, 1), num_channels=1,
                                       cond_dim=16, with_attn=False, use_pallas=False)
    gan = CondGan(gen=gen, discrims=[discrim], cond_encoder=enc)
    cfg = TrainConfig(frame_sizes=(8, 16), subsample_input=True, latent_size=8)
    opt = optax.adam(1e-4)
    batch = {"video": jnp.zeros((4, 4, 16, 16, 1)),
             "captions": jnp.ones((4, 8), jnp.int32),
             "lengths": jnp.full((4,), 8, jnp.int32)}
    state = init_state(gan, jax.random.key(0), batch, opt, opt, cfg)
    ckpt = root / "ckpt"
    save_state(state, str(ckpt))
    return root, ckpt


def test_sample_cli(tiny_checkpoint, tmp_path):
    from txt2vid_tpu import sample as sample_cli

    root, ckpt = tiny_checkpoint
    args = types.SimpleNamespace(
        weights=str(ckpt), G=GEN_SPEC, D=[DIS_SPEC], sent=SENT_SPEC,
        vocab=str(root / "vocab.pickle"), dont_use_sent=False,
        sentences=["digit 3 is left and right."],
        frame_sizes=[8, 16], num_frames=4, num_channels=1, num_samples=4,
        out_samples=str(tmp_path / "samples"), seed=0)
    sample_cli.main(args)
    import os
    files = os.listdir(tmp_path / "samples")
    assert any(f.startswith("sample_") for f in files)


def test_eval_cli(tiny_checkpoint):
    from txt2vid_tpu.eval import run as eval_cli

    root, ckpt = tiny_checkpoint
    args = types.SimpleNamespace(
        weights=str(ckpt), G=GEN_SPEC, D=[DIS_SPEC], sent=SENT_SPEC,
        vocab=str(root / "vocab.pickle"), dont_use_sent=False,
        data=str(root / "videos"), anno=str(root / "sent.pickle"),
        frame_sizes=[8, 16], num_frames=4, num_channels=1,
        num=8, batch_size=4, seed=0)
    report = eval_cli.main(args)
    assert np.isfinite(report["fid_random_conv"])
    assert report["fid_random_conv"] >= 0

def test_console_script_entry_points():
    """pyproject.toml [project.scripts] names resolve to callables, and each cli()
    accepts an argv list (missing required args -> argparse SystemExit(2))."""
    import contextlib
    import importlib
    import io
    import pathlib
    import tomllib

    root = pathlib.Path(__file__).resolve().parents[1]
    scripts = tomllib.load(open(root / "pyproject.toml", "rb"))["project"]["scripts"]
    assert set(scripts) == {"txt2vid-train", "txt2vid-train-txt",
                            "txt2vid-sample", "txt2vid-serve"}
    for target in scripts.values():
        mod_name, fn_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), fn_name)
        with pytest.raises(SystemExit) as exc:
            with contextlib.redirect_stderr(io.StringIO()):
                fn([])
        assert exc.value.code == 2
