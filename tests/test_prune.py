"""scripts/prune_ckpts.sh — the dense-trail checkpoint pruner.

The r4 flagship writes a checkpoint every 250 iters through NaN-abort basins
(RESULTS.md: the iter-5.5k lock-in intervention); the pruner keeps the disk
bounded without touching the rollback trail. It deletes data, so its selection
logic is pinned here: keep every KEEP_MOD-multiple, keep the newest KEEP_TAIL
unconditionally, and a sibling .ema artifact follows its base checkpoint.
"""
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "prune_ckpts.sh"


def _mk(out, iters, ema=()):
    for it in iters:
        (out / f"iter_{it}_lossG_1.0_lossD_0.5").mkdir()
    for it in ema:
        (out / f"iter_{it}_lossG_1.0_lossD_0.5.ema").mkdir()


def _iters(out):
    return sorted(
        int(p.name.split("_")[1])
        for p in out.glob("iter_*")
        if not p.name.endswith(".ema")
    )


def test_keeps_mod_and_tail(tmp_path):
    iters = list(range(5000, 8500, 250))  # 5000..8250
    _mk(tmp_path, iters, ema=[8000])
    subprocess.run(["bash", str(SCRIPT), str(tmp_path)], check=True,
                   capture_output=True)
    kept = _iters(tmp_path)
    # newest 8 kept unconditionally; below that only 1000-multiples survive
    assert kept == [5000, 6000, 6500, 6750, 7000, 7250, 7500, 7750, 8000, 8250]
    # .ema sibling of a kept base survives
    assert (tmp_path / "iter_8000_lossG_1.0_lossD_0.5.ema").exists()


def test_ema_sibling_pruned_with_base(tmp_path):
    iters = list(range(1000, 4500, 250))  # 1000..4250, 14 ckpts
    _mk(tmp_path, iters, ema=[1250])
    subprocess.run(["bash", str(SCRIPT), str(tmp_path)], check=True,
                   capture_output=True)
    kept = _iters(tmp_path)
    assert 1250 not in kept
    assert not (tmp_path / "iter_1250_lossG_1.0_lossD_0.5.ema").exists()


def test_noop_when_under_tail(tmp_path):
    iters = [250, 500, 750, 1000, 1250]
    _mk(tmp_path, iters)
    subprocess.run(["bash", str(SCRIPT), str(tmp_path)], check=True,
                   capture_output=True)
    assert _iters(tmp_path) == iters


def test_custom_mod_and_tail(tmp_path):
    iters = list(range(100, 1100, 100))  # 100..1000
    _mk(tmp_path, iters)
    subprocess.run(["bash", str(SCRIPT), str(tmp_path), "500", "2"],
                   check=True, capture_output=True)
    assert _iters(tmp_path) == [500, 900, 1000]


def test_empty_dir_ok(tmp_path):
    subprocess.run(["bash", str(SCRIPT), str(tmp_path)], check=True,
                   capture_output=True)
