"""Reflection-based config system.

Behavior parity with reference txt2vid/util/reflection.py:12-49: a component spec is
either a dotted class path ("pkg.mod.Class"), a path to a JSON file, or a dict of the
form {"class": "pkg.mod.Class", "args": {...}}; explicit kwargs override JSON args.

Additions over the reference:
  * legacy aliasing — specs written against the reference package ("txt2vid.*", as in
    the shipped config/*.json files) transparently resolve to their txt2vid_tpu
    equivalents, so reference configs keep working verbatim.
  * `get_callable` resolves functions as well as classes (our model "classes" are
    flax module factories).
"""

import json
from pathlib import Path

# Map reference dotted paths to this framework's equivalents. Longest prefix wins.
LEGACY_ALIASES = {
    "txt2vid.models.tganv2_cond.gen.MultiScaleGen": "txt2vid_tpu.models.tganv2_cond.MultiScaleGen",
    "txt2vid.models.tganv2_cond.discrim.MultiScaleDiscrim": "txt2vid_tpu.models.tganv2_cond.MultiScaleDiscrim",
    "txt2vid.models.tganv2.gen.MultiScaleGen": "txt2vid_tpu.models.tganv2.MultiScaleGen",
    "txt2vid.models.tganv2.discrim.MultiScaleDiscrim": "txt2vid_tpu.models.tganv2.MultiScaleDiscrim",
    "txt2vid.models.tgan.gen.Gen": "txt2vid_tpu.models.tgan.Gen",
    "txt2vid.models.tgan.discrim.Discrim": "txt2vid_tpu.models.tgan.Discrim",
    "txt2vid.models.tcwyt.gen.Gen": "txt2vid_tpu.models.tcwyt.Gen",
    "txt2vid.models.tcwyt.video_discrim.VideoDiscrim": "txt2vid_tpu.models.tcwyt.VideoDiscrim",
    "txt2vid.models.tcwyt.frame_discrim.FrameDiscrim": "txt2vid_tpu.models.tcwyt.FrameDiscrim",
    "txt2vid.models.tcwyt.frame_discrim.FrameMap": "txt2vid_tpu.models.tcwyt.FrameMap",
    "txt2vid.models.tcwyt.motion_discrim.MotionDiscrim": "txt2vid_tpu.models.tcwyt.MotionDiscrim",
    "txt2vid.models.img.models.Gen": "txt2vid_tpu.models.img.Gen",
    "txt2vid.models.img.models.Discrim": "txt2vid_tpu.models.img.Discrim",
    "txt2vid.models.txt.basic.Seq2Seq": "txt2vid_tpu.models.txt.Seq2Seq",
    "txt2vid.gan.losses": "txt2vid_tpu.gan.losses",
    "txt2vid.data": "txt2vid_tpu.data",
}


def resolve_alias(dotted: str) -> str:
    if dotted in LEGACY_ALIASES:
        return LEGACY_ALIASES[dotted]
    for prefix, target in LEGACY_ALIASES.items():
        if dotted.startswith(prefix + "."):
            return target + dotted[len(prefix):]
    return dotted


def get_class(dotted: str):
    """Import `pkg.mod.Name` and return the attribute (reference reflection.py:4-10)."""
    dotted = resolve_alias(dotted)
    parts = dotted.split(".")
    module = ".".join(parts[:-1])
    m = __import__(module)
    for comp in parts[1:]:
        m = getattr(m, comp)
    return m


get_callable = get_class


def create_object(spec, **kwargs):
    """Instantiate a component from a spec (reference reflection.py:12-22 semantics).

    spec may be: a dotted path string, a path to a JSON file, or a dict
    {"class": ..., "args": {...}}. kwargs override JSON-provided args.
    """
    if isinstance(spec, str):
        spec = spec.strip()
        if spec.startswith("{"):                 # inline JSON spec
            return create_object(json.loads(spec), **kwargs)
        if Path(spec).exists():
            with open(spec) as f:
                return create_object(json.load(f), **kwargs)
        return create_object({"class": spec}, **kwargs)
    assert isinstance(spec, dict) and "class" in spec, f"bad component spec: {spec!r}"
    cls = get_class(spec["class"])
    args = dict(spec.get("args", {}))
    args.update(kwargs)
    return cls(**args)
