"""Golden cross-validation of the state codec against the reference codec.

VERDICT.md round-1 item 3: self-roundtrip tests are circular —
encode(decode(x)) == x holds for any consistent-but-wrong schema.  Here the
reference's own pure-Python serializer/deserializer
(/root/reference/arp_dt/assets/{serialize,deserialize}.py) are loaded as
oracles and cross-checked both directions, bytes and dicts, for
coinrun/maze x AISC/none:

  * ours.encode(state)  ==  reference.serialize(state)   (byte-identical)
  * reference.serialize(state) --ours.decode--> state    (field-identical)
  * ours.encode(state) --reference.deserialize--> state  (field-identical)
"""

import importlib.util
import pathlib

import pytest

from arp_tpu.envs.state_codec import decode_state, encode_state
from tests.test_envs_rollout import _sample_state

REF_ASSETS = pathlib.Path("/root/reference/arp_dt/assets")

pytestmark = pytest.mark.skipif(
    not REF_ASSETS.exists(), reason="reference codec not available"
)


def _load(name):
    spec = importlib.util.spec_from_file_location(f"ref_{name}", REF_ASSETS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load("serialize"), _load("deserialize")


AISC_FIELDS = dict(
    random_percent=50, key_penalty=1, step_penalty=2, rand_region=5, continue_after_coin=1
)


def _cases():
    coinrun = _sample_state("coinrun")
    maze = _sample_state("maze")
    coinrun_aisc = dict(_sample_state("coinrun_aisc"), **AISC_FIELDS)
    maze_aisc = dict(_sample_state("maze_aisc"), **AISC_FIELDS)
    # env_type="aisc" adds the AISC block even without an "_" in the name
    coinrun_envtype = dict(coinrun, **AISC_FIELDS)
    return [
        ("coinrun", "none", coinrun),
        ("maze", "none", maze),
        ("coinrun_aisc", "none", coinrun_aisc),
        ("maze_aisc", "none", maze_aisc),
        ("coinrun", "aisc", coinrun_envtype),
    ]


def _ref_serialize_bytes(ref_ser, state, env_type, tmp_path):
    ref_ser.serialize(str(tmp_path), state, filename="golden.dat", env_type=env_type)
    return (tmp_path / "golden.dat").read_bytes()


def _assert_fields_equal(got, want):
    assert set(got) == set(want), set(got) ^ set(want)
    for key, val in want.items():
        if isinstance(val, float):
            assert abs(got[key] - val) < 1e-6, key
        elif key == "entities":
            for g_ent, w_ent in zip(got[key], val, strict=True):
                _assert_fields_equal(g_ent, w_ent)
        elif isinstance(val, bool):
            assert bool(got[key]) == val, key
        else:
            assert got[key] == val, key


@pytest.mark.parametrize("game,env_type,_idx", [(g, e, i) for i, (g, e, _) in enumerate(_cases())])
def test_bytes_identical_to_reference_serializer(ref, tmp_path, game, env_type, _idx):
    state = _cases()[_idx][2]
    ref_bytes = _ref_serialize_bytes(ref[0], state, env_type, tmp_path)
    assert encode_state(state, env_type=env_type) == ref_bytes


@pytest.mark.parametrize("game,env_type,_idx", [(g, e, i) for i, (g, e, _) in enumerate(_cases())])
def test_our_decoder_reads_reference_bytes(ref, tmp_path, game, env_type, _idx):
    state = _cases()[_idx][2]
    ref_bytes = _ref_serialize_bytes(ref[0], state, env_type, tmp_path)
    _assert_fields_equal(decode_state(ref_bytes, env_type=env_type), state)


@pytest.mark.parametrize("game,env_type,_idx", [(g, e, i) for i, (g, e, _) in enumerate(_cases())])
def test_reference_decoder_reads_our_bytes(ref, game, env_type, _idx):
    state = _cases()[_idx][2]
    got = ref[1].deserialize(encode_state(state, env_type=env_type), env_type=env_type)
    # reference deserializer returns bools for has_support etc. and ignores
    # the trailing sentinel; compare on its own terms
    _assert_fields_equal(got, state)
