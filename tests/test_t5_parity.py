"""umT5 encoder parity vs transformers.UMT5EncoderModel (an independent
implementation): random HF weights mapped into our pytree must produce
matching hidden states. Validates attention (no q scaling), per-layer
relative position bias, gated-GELU FFN, and RMS layer norms."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from realtime_video_tpu.config import T5Config  # noqa: E402
from realtime_video_tpu.models import t5 as t5_mod  # noqa: E402


def hf_to_params(model, cfg: T5Config):
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}

    def lin(name):
        return {"w": jnp.asarray(sd[name].T, jnp.float32)}

    blocks = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        blocks.append({
            "norm1": {"scale": jnp.asarray(sd[f"{b}.layer.0.layer_norm.weight"], jnp.float32)},
            "attn": {
                "q": lin(f"{b}.layer.0.SelfAttention.q.weight"),
                "k": lin(f"{b}.layer.0.SelfAttention.k.weight"),
                "v": lin(f"{b}.layer.0.SelfAttention.v.weight"),
                "o": lin(f"{b}.layer.0.SelfAttention.o.weight"),
            },
            "norm2": {"scale": jnp.asarray(sd[f"{b}.layer.1.layer_norm.weight"], jnp.float32)},
            "ffn": {
                # HF gated act: h = act(wi_0(x)) * wi_1(x); ours:
                # fc1(x) * gelu(gate(x)) -> gate=wi_0, fc1=wi_1
                "gate": lin(f"{b}.layer.1.DenseReluDense.wi_0.weight"),
                "fc1": lin(f"{b}.layer.1.DenseReluDense.wi_1.weight"),
                "fc2": lin(f"{b}.layer.1.DenseReluDense.wo.weight"),
            },
            "rel_emb": jnp.asarray(
                sd[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"],
                jnp.float32,
            ),
        })
    import jax

    return {
        "token_embedding": jnp.asarray(sd["shared.weight"], jnp.float32),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "norm": {"scale": jnp.asarray(sd["encoder.final_layer_norm.weight"], jnp.float32)},
    }


def test_umt5_matches_transformers():
    hf_cfg = transformers.UMT5Config(
        vocab_size=128, d_model=32, d_kv=16, d_ff=64, num_heads=2,
        num_layers=2, num_decoder_layers=2,
        relative_attention_num_buckets=32, relative_attention_max_distance=128,
        dropout_rate=0.0, feed_forward_proj="gated-gelu", is_encoder_decoder=False,
    )
    torch.manual_seed(0)
    hf = transformers.UMT5EncoderModel(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=128, dim=32, dim_attn=32, dim_ffn=64, num_heads=2,
        num_layers=2, num_buckets=32, shared_pos=False, max_dist=128, text_len=16,
    )
    params = hf_to_params(hf, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 128, size=(2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[0, 10:] = 0
    ids[0, 10:] = 0

    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    got = np.asarray(t5_mod.t5_encode(cfg, params, jnp.asarray(ids), jnp.asarray(mask)))
    # compare only unmasked positions (HF computes padded positions too but
    # they are meaningless)
    np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[0, :10], want[0, :10], rtol=2e-4, atol=2e-4)
