"""Golden pins for the instruction assets (arp_tpu/data/instructions.py).

These strings are CLIP/M3AE conditioning prompts: changing one word changes
every labeled reward and every instruction-conditioned policy input
(reference: arp_dt/data_procgen.py:266-317).  The sha256 pins freeze the
exact bytes — including the reference's own typo — so a well-meaning edit
cannot silently re-label the world.  If a pin fails, the ONLY valid fix is
reverting the string; never update a hash without re-deriving the strings
from the reference.
"""

import hashlib
import json

import pytest

from arp_tpu.data import instructions as I

TASKS = [
    "coinrun", "coinrun_aisc", "maze", "maze_aisc",
    "maze_yellowline", "maze_redline_yellowgem",
]
SPECIAL_COMBOS = [
    ("coinrun", "random1"), ("coinrun", "random2"),
    ("coinrun", "misinfo"), ("coinrun_aisc", "misinfo"),
    ("maze_aisc", "misinfo"), ("maze_yellowline", "misinfo"),
    ("coinrun", "misinfo2"), ("coinrun", "misinfo3"), ("coinrun", "misinfo4"),
]


def _pin(obj) -> str:
    return hashlib.sha256(json.dumps(obj, sort_keys=True).encode()).hexdigest()[:16]


def test_instruction_maps_are_byte_pinned():
    assert _pin({t: I.get_m3ae_instruct(t) for t in TASKS}) == "aa5fc130a4eee89e"
    assert _pin({t: I.get_clip_instruct(t) for t in TASKS}) == "aa5fc130a4eee89e"
    assert _pin(
        {f"{e}:{t}": I.get_clip_special_instruct(e, t) for e, t in SPECIAL_COMBOS}
    ) == "c2d09438eb3a5232"
    assert _pin(I.PROCGEN_INSTRUCT_SHORT) == "60522637996c2066"
    assert _pin(I.PROCGEN_PROMPTS) == "17025d55b06cea97"


def test_reference_typo_is_preserved():
    """The reference's misinfo maze_aisc prompt contains 'reacth' — byte
    parity means keeping it.  This test exists so nobody 'fixes' it."""
    assert "reacth" in I.get_clip_special_instruct("maze_aisc", "misinfo")


def test_instruction_semantics():
    # every benchmark split resolves to a prompt; both encoders agree
    for t in TASKS:
        assert I.get_clip_instruct(t) == I.get_m3ae_instruct(t) is not None
    # unknown tasks return None (callers handle the no-instruction case)
    assert I.get_clip_instruct("bigfish") is None
    # random ablations are env-independent
    assert I.get_clip_special_instruct("maze_aisc", "random1") == \
        I.get_clip_special_instruct("coinrun", "random1")
    # an unmatched (env, inst_type) pair raises — the reference's
    # "You must pass any condition." guard (data_procgen.py)
    with pytest.raises(ValueError, match="condition"):
        I.get_clip_special_instruct("maze", "misinfo2")


def test_eval_instruct_fallback():
    """Eval-time lookup (train/common.py) covers all five paper eval splits.

    The reference keys the eval instruction on {game}_{eval_env_type}
    (main_procgen.py:560-566) but has no asset for three of its own paper
    splits; get_eval_instruct falls back to the base game's instruction there.
    """
    # exact keys pass through untouched
    assert I.get_eval_instruct("coinrun_aisc") == I.get_clip_instruct("coinrun_aisc")
    # the three uncovered paper eval splits fall back to the base game
    assert I.get_eval_instruct("coinrun_aisc_gem") == I.get_clip_instruct("coinrun")
    assert I.get_eval_instruct("maze_redline") == I.get_clip_instruct("maze")
    assert I.get_eval_instruct("maze_reddiag_redstraight_yellowgem") == I.get_clip_instruct("maze")
    # unknown base game still yields None (callers raise with guidance)
    assert I.get_eval_instruct("bigfish_foo") is None
