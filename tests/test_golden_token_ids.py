"""Golden token-id fixtures for the REAL tokenizer assets (VERDICT r4 #2).

Zero egress keeps ``bpe_simple_vocab_16e6.txt.gz`` (OpenAI CLIP BPE merges,
reference arp_dt/models/openai/tokenizer.py:43-64) and the BERT wordpiece
vocab (reference data_procgen.py:208-249 via transformers) out of this image,
so exact-id parity is unprovable here — but it must become provable THE
MOMENT the asset lands in ``arp_tpu/assets/`` (or the cache/env paths).
These tests skip while the asset is absent and pin known-good id sequences
from the upstream tokenizers once it appears: drop the file in, run
``pytest -k golden_ids``, and exactness is decided automatically.

Golden values come from the published OpenAI CLIP tokenizer
(``clip.tokenize`` on the stock merges file: SOT=49406, EOT=49407) and the
stock bert-base-uncased vocabulary (CLS=101, SEP=102).
"""

import numpy as np
import pytest

from arp_tpu.models.clip.download import resolve_asset

# (text, ids between SOT/EOT) — clip.tokenize("a diagram"/"a dog"/"a cat"
# from the upstream README example, plus the standard prompt template
CLIP_GOLDEN = [
    ("a diagram", [320, 22697]),
    ("a dog", [320, 1929]),
    ("a cat", [320, 2368]),
    ("a photo of a cat", [320, 1125, 539, 320, 2368]),
]
SOT, EOT = 49406, 49407

# (text, full ids incl. [CLS]/[SEP]) — stock bert-base-uncased
BERT_GOLDEN = [
    ("hello world", [101, 7592, 2088, 102]),
    ("a photo of a dog", [101, 1037, 6302, 1997, 1037, 3899, 102]),
]


@pytest.mark.parametrize("text,ids", CLIP_GOLDEN, ids=[t for t, _ in CLIP_GOLDEN])
def test_clip_bpe_golden_ids(text, ids):
    if resolve_asset("clip_bpe") is None:
        pytest.skip("bpe_simple_vocab_16e6.txt.gz not staged (zero-egress image); "
                    "drop it into arp_tpu/assets/ to activate exact-id checks")
    from arp_tpu.models.clip.tokenizer import build_tokenizer

    tok = build_tokenizer(truncate=True)
    assert tok.tokenizer.identity.startswith("bpe:"), tok.tokenizer.identity
    row = np.asarray(tok([text]))[0]
    want = [SOT] + ids + [EOT]
    np.testing.assert_array_equal(row[: len(want)], want)
    assert (row[len(want):] == 0).all()


@pytest.mark.parametrize("text,ids", BERT_GOLDEN, ids=[t for t, _ in BERT_GOLDEN])
def test_bert_wordpiece_golden_ids(text, ids):
    if resolve_asset("bert_vocab") is None:
        pytest.skip("bert-base-uncased vocab not staged (zero-egress image); "
                    "drop it into arp_tpu/assets/ to activate exact-id checks")
    from arp_tpu.data.procgen_dataset import build_instruction_tokenizer

    tok = build_instruction_tokenizer(use_bert=True, max_length=32)
    row, pad = tok(text)
    row = np.asarray(row)
    np.testing.assert_array_equal(row[: len(ids)], ids)
    # padding mask: 0 over real tokens, 1 over padding (m3ae convention)
    pad = np.asarray(pad)
    assert pad[: len(ids)].sum() == 0 and pad[len(ids):].all()
