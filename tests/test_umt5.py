"""UMT5 encoder parity vs HF transformers (the real library, baked in)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vist3a_tpu.io.weight_import import import_umt5
from vist3a_tpu.nn import umt5

TINY = dict(vocab_size=96, d_model=32, d_kv=8, num_heads=4, d_ff=48,
            num_layers=3, feed_forward_proj="gated-gelu", dropout_rate=0.0)
TINY_CFG = umt5.UMT5Config(vocab_size=96, d_model=32, d_kv=8, num_heads=4,
                           d_ff=48, num_layers=3)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import UMT5Config, UMT5EncoderModel
    torch.manual_seed(0)
    m = UMT5EncoderModel(UMT5Config(**TINY))
    m.eval()
    return m


def test_encode_matches_transformers(hf_model, rng):
    import torch
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = import_umt5(sd, TINY_CFG.num_layers)

    b, n = 2, 20
    ids = rng.integers(0, 96, (b, n))
    mask = np.ones((b, n), np.int64)
    mask[0, 13:] = 0          # ragged lengths
    mask[1, 7:] = 0

    with torch.no_grad():
        want = hf_model(torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask)
                        ).last_hidden_state.numpy()
    # Wan zeroes embeddings past each true length (`wan_utils.py:53-59`)
    want = want * mask[..., None]

    got = jax.jit(lambda p, i, m: umt5.encode(p, i, m, TINY_CFG))(
        params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_encode_matches_at_wan_length(hf_model, rng):
    """226 tokens (the Wan padding length) exercises the logarithmic
    long-distance relative-position buckets past max_distance."""
    import torch
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = import_umt5(sd, TINY_CFG.num_layers)

    n = TINY_CFG.max_sequence_length
    ids = rng.integers(0, 96, (1, n))
    mask = np.ones((1, n), np.int64)
    mask[0, 150:] = 0

    with torch.no_grad():
        want = hf_model(torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask)
                        ).last_hidden_state.numpy()
    want = want * mask[..., None]
    got = umt5.encode(params, jnp.asarray(ids), jnp.asarray(mask), TINY_CFG)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)
