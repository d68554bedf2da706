"""m3ae reverse checkpoint interop + frozen-encoder trainer CLI e2e.

export_reference_m3ae_params writes this module tree back under the
reference's auto-generated names (the format load_m3ae_model_vars ingests,
reference: arp_dt/models/m3ae/model.py:996-1015 pickles). The CLI test
drives the previously-uncovered FROZEN m3ae path (use_from_scratch=False)
through the real loader + --model.frozen_bf16, pinned against the fp32 run.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from arp_tpu.models import m3ae as m3ae_lib
from arp_tpu.models.m3ae import (
    convert_reference_m3ae_params,
    export_reference_m3ae_params,
)
from arp_tpu.models.policy.models import BERT_VOCAB_SIZE

TINY = dict(model_type="custom", emb_dim=32, dec_emb_dim=16, depth=2, dec_depth=1,
            num_heads=4, dec_num_heads=4, mlp_ratio=2)


def _tiny_model_and_params():
    model = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(TINY), text_vocab_size=BERT_VOCAB_SIZE
    )
    probe = jnp.zeros((1, 4, 8 * 8 * 3), jnp.float32)
    params = jax.jit(
        lambda r: model.init({"params": r}, probe, None, None,
                             method=model.forward_representation, deterministic=True)
    )(jax.random.PRNGKey(0))
    return model, params, probe


def test_export_convert_round_trip_exact():
    _, params, _ = _tiny_model_and_params()
    ref = export_reference_m3ae_params(params)
    # the exported tree uses reference naming (spot-check the block rename)
    enc = ref["params"]["encoder"]
    assert "Block_0" in enc and "LayerNorm_0" in enc
    assert "Dense_0" in enc["Block_0"]["Attention_0"]

    back = convert_reference_m3ae_params(ref)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_loader_reads_exported_pickle(tmp_path):
    model, params, probe = _tiny_model_and_params()
    with open(tmp_path / "m3ae_base_params.pkl", "wb") as f:
        pickle.dump(export_reference_m3ae_params(params), f)
    loaded = m3ae_lib.load_m3ae_model_vars("vit_b16", checkpoint_dir=str(tmp_path))
    want = model.apply(params, probe, None, None,
                       method=model.forward_representation, deterministic=True)
    got = model.apply(loaded, probe, None, None,
                      method=model.forward_representation, deterministic=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
