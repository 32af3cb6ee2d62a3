"""Infrastructure tests: config/reflection system, checkpoint round-trip, utils,
and the dp-sharded train step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from txt2vid_tpu.config import create_object, get_class, resolve_alias
from txt2vid_tpu.utils import RollingAvg, gen_perm, count_params
from txt2vid_tpu.utils.checkpoint import (
    checkpoint_name, save_state, restore_state, latest_checkpoint)


class TestConfig:
    def test_dotted_path(self):
        cls = get_class("txt2vid_tpu.gan.losses.RSGANLoss")
        assert cls.__name__ == "RSGANLoss"

    def test_create_from_dict_with_override(self):
        obj = create_object(
            {"class": "txt2vid_tpu.models.tcwyt.Gen", "args": {"z_size": 32}},
            cond_dim=8)
        assert obj.z_size == 32 and obj.cond_dim == 8

    def test_json_file(self, tmp_path):
        import json
        p = tmp_path / "spec.json"
        p.write_text(json.dumps({"class": "txt2vid_tpu.models.img.Gen",
                                 "args": {"dim": 16}}))
        obj = create_object(str(p))
        assert obj.dim == 16

    def test_legacy_alias(self):
        # reference config/*.json paths must keep working
        assert resolve_alias("txt2vid.data.my_dataset") == "txt2vid_tpu.data.my_dataset"
        assert resolve_alias("txt2vid.gan.losses.RSGANLoss") == \
            "txt2vid_tpu.gan.losses.RSGANLoss"
        cls = get_class("txt2vid.models.tcwyt.gen.Gen")
        assert cls.__name__ == "Gen"


class TestUtils:
    def test_rolling_avg(self):
        r = RollingAvg(window_size=3)
        for v in [1, 2, 3, 4]:
            r.update(v)
        assert r.get() == pytest.approx(3.0)

    def test_gen_perm_no_identity(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            p = gen_perm(5, rng)
            assert not np.array_equal(p, np.arange(5))

    def test_count_params(self):
        tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
        assert count_params(tree) == 10


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                 "step": np.int32(7)}
        path = tmp_path / checkpoint_name(7, 1.2345, 0.5)
        save_state(state, str(path))
        template = {"params": {"w": np.zeros((2, 3), np.float32)},
                    "step": np.int32(0)}
        restored = restore_state(template, str(path))
        np.testing.assert_array_equal(restored["params"]["w"],
                                      state["params"]["w"])
        assert int(restored["step"]) == 7

    def test_latest(self, tmp_path):
        for it in (100, 300, 200):
            (tmp_path / checkpoint_name(it, 0.0, 0.0)).write_bytes(b"x")
        assert "iter_300" in latest_checkpoint(str(tmp_path))
        assert latest_checkpoint(str(tmp_path / "missing")) is None


class TestShardedStep:
    def test_dp_mesh_8_devices(self):
        # the dryrun path: full conditional train step over a dp=8 mesh
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestTxtHandoff:
    def test_restore_txt_vars_from_pretrain_checkpoint(self, tmp_path):
        """The txt-pretrain -> GAN --sent_weights handoff: txt.py saves
        {"optim": opt_state, "txt": {"params": ...}}; the GAN CLI must recover the
        variables without knowing the optimizer's structure."""
        import jax
        import jax.numpy as jnp
        import optax
        from txt2vid_tpu.models.txt import Seq2Seq
        from txt2vid_tpu.utils.checkpoint import restore_txt_vars

        model = Seq2Seq(vocab_size=12, embed_size=8, hidden_size=16, num_layers=1)
        caps = np.ones((2, 4), np.int32)
        variables = model.init(jax.random.key(0), jnp.asarray(caps),
                               lengths=jnp.array([4, 4]))
        opt = optax.adam(1e-4)
        opt_state = opt.init(variables["params"])
        path = tmp_path / "txt_final"
        save_state({"optim": opt_state, "txt": {"params": variables["params"]}},
                   str(path))

        restored = restore_txt_vars(str(path))
        ref = jax.tree_util.tree_leaves(variables["params"])
        got = jax.tree_util.tree_leaves(restored["params"])
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_txt_vars_bare(self, tmp_path):
        import numpy as _np
        from txt2vid_tpu.utils.checkpoint import restore_txt_vars
        path = tmp_path / "bare"
        save_state({"params": {"w": _np.ones((2, 2), _np.float32)}}, str(path))
        restored = restore_txt_vars(str(path))
        _np.testing.assert_array_equal(restored["params"]["w"], _np.ones((2, 2)))
