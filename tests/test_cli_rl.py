"""RL (reward-aligned) VDM training from the CLI surface: in-framework
scorer text features (`utils/reward.py:152-174`) + a full SFT+reward step
driven through `cli.train_vdm.run` (`train_vdm.py:566-637`)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_clip_tokenizer import MERGES, build_vocab
from test_stitched_model import tiny_encoder_cfg
from vist3a_tpu.cli import train_vdm as cli_vdm
from vist3a_tpu.nn import clip as clip_mod
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn import wan_dit, wan_vae
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.train import reward as reward_mod
from vist3a_tpu.train import vdm

VOCAB = build_vocab(MERGES)
V = max(VOCAB.values()) + 1   # build_vocab has a duplicate ("a</w>")

TINY_VIS = clip_mod.CLIPVisionConfig(hidden_size=32, num_layers=2,
                                     num_heads=4, mlp_dim=64, patch_size=8,
                                     image_size=32, projection_dim=16,
                                     act="gelu")
TINY_TEXT = clip_mod.CLIPTextConfig(hidden_size=32, num_layers=2,
                                    num_heads=4, mlp_dim=64, vocab_size=V,
                                    context_length=16, projection_dim=16,
                                    act="gelu")
RCFG = reward_mod.RewardConfig(pick_cfg=TINY_VIS, pe_cfg=TINY_VIS)


def _hf_clip_model():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         vocab_size=V, max_position_embeddings=16,
                         hidden_act="gelu", eos_token_id=V - 1,
                         bos_token_id=V - 2, pad_token_id=V - 1),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           patch_size=8, image_size=32, hidden_act="gelu"),
        projection_dim=16)
    return CLIPModel(cfg).eval()


def _oc_layout(sd):
    """HF full-CLIPModel state dict → open_clip naming (both towers)."""
    oc = {
        "visual.conv1.weight":
            sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding":
            sd["vision_model.embeddings.class_embedding"].reshape(-1),
        "visual.positional_embedding":
            sd["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": sd["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": sd["vision_model.post_layernorm.bias"],
        # ascontiguousarray: safetensors.numpy silently mis-serializes
        # transposed (non-contiguous) views
        "visual.proj": np.ascontiguousarray(sd["visual_projection.weight"].T),
        "token_embedding.weight":
            sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding":
            sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        "text_projection": np.ascontiguousarray(sd["text_projection.weight"].T),
        "logit_scale": sd["logit_scale"],
    }
    for tower, hf_p, oc_p in ((0, "vision_model.encoder.layers",
                               "visual.transformer.resblocks"),
                              (1, "text_model.encoder.layers",
                               "transformer.resblocks")):
        for i in range(TINY_TEXT.num_layers):
            p, o = f"{hf_p}.{i}", f"{oc_p}.{i}"
            oc[f"{o}.attn.in_proj_weight"] = np.concatenate(
                [sd[f"{p}.self_attn.q_proj.weight"],
                 sd[f"{p}.self_attn.k_proj.weight"],
                 sd[f"{p}.self_attn.v_proj.weight"]], axis=0)
            oc[f"{o}.attn.in_proj_bias"] = np.concatenate(
                [sd[f"{p}.self_attn.q_proj.bias"],
                 sd[f"{p}.self_attn.k_proj.bias"],
                 sd[f"{p}.self_attn.v_proj.bias"]], axis=0)
            oc[f"{o}.attn.out_proj.weight"] = \
                sd[f"{p}.self_attn.out_proj.weight"]
            oc[f"{o}.attn.out_proj.bias"] = sd[f"{p}.self_attn.out_proj.bias"]
            oc[f"{o}.ln_1.weight"] = sd[f"{p}.layer_norm1.weight"]
            oc[f"{o}.ln_1.bias"] = sd[f"{p}.layer_norm1.bias"]
            oc[f"{o}.ln_2.weight"] = sd[f"{p}.layer_norm2.weight"]
            oc[f"{o}.ln_2.bias"] = sd[f"{p}.layer_norm2.bias"]
            oc[f"{o}.mlp.c_fc.weight"] = sd[f"{p}.mlp.fc1.weight"]
            oc[f"{o}.mlp.c_fc.bias"] = sd[f"{p}.mlp.fc1.bias"]
            oc[f"{o}.mlp.c_proj.weight"] = sd[f"{p}.mlp.fc2.weight"]
            oc[f"{o}.mlp.c_proj.bias"] = sd[f"{p}.mlp.fc2.bias"]
    return oc


@pytest.fixture(scope="module")
def scorer_root(tmp_path_factory):
    """A weights root with pickscore/ (HF layout + tokenizer files) and
    dfn5b/ (open_clip layout), both from one tiny CLIPModel."""
    from safetensors.numpy import save_file

    root = tmp_path_factory.mktemp("scorers")
    m = _hf_clip_model()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    sd = {k: v for k, v in sd.items() if "position_ids" not in k}

    pick = root / "pickscore"
    pick.mkdir()
    save_file(sd, str(pick / "model.safetensors"))
    (pick / "vocab.json").write_text(json.dumps(VOCAB), encoding="utf-8")
    (pick / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(x) for x in MERGES) + "\n",
        encoding="utf-8")

    dfn = root / "dfn5b"
    dfn.mkdir()
    save_file(_oc_layout(sd), str(dfn / "model.safetensors"))
    return root, m


def test_build_reward_fns_text_parity(scorer_root):
    """reward_text_fn must reproduce HF get_text_features for the
    PickScore tower (`utils/reward.py:152-158`)."""
    torch = pytest.importorskip("torch")
    root, m = scorer_root
    loss_fn, text_fn = cli_vdm.build_reward_fns(root, rcfg=RCFG,
                                                text_cfg=TINY_TEXT)
    prompt = "a photo of a cat"
    pick_text, pe_text = text_fn(prompt)
    assert pick_text.shape == (1, 16) and pe_text.shape == (1, 16)

    from vist3a_tpu.data.clip_tokenizer import CLIPTokenizer
    tok = CLIPTokenizer.from_files(str(root / "pickscore" / "vocab.json"),
                                   str(root / "pickscore" / "merges.txt"))
    ids = tok([prompt], 16, pad="eos")
    with torch.no_grad():
        want = m.get_text_features(input_ids=torch.from_numpy(
            ids.astype(np.int64)))
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(np.asarray(pick_text), want, rtol=2e-4,
                               atol=2e-4)
    # both towers share weights here, but tokenize with different padding;
    # features must still agree (argmax-EOS pooling ignores the padding)
    np.testing.assert_allclose(np.asarray(pe_text), want, rtol=2e-4,
                               atol=2e-4)

    # the loss fn accepts runtime text and is differentiable wrt pixels
    im = jnp.zeros((2, 3, 40, 40))
    loss, mixed, scores = loss_fn(im, pick_text=pick_text, pe_text=pe_text)
    assert np.isfinite(float(loss)) and np.isfinite(float(mixed))


class _TextLoader:
    def __init__(self, prompts):
        self.prompts = prompts

    def __iter__(self):
        for p in self.prompts:
            yield {"prompt": [p]}

    def __len__(self):
        return len(self.prompts)


class _VideoLoader:
    def __init__(self, n, shape=(1, 3, 5, 64, 64)):
        self.n, self.shape = n, shape

    def __iter__(self):
        rng = np.random.default_rng(0)
        for _ in range(self.n):
            yield {"image_tensor":
                   rng.random(self.shape, np.float32) * 2 - 1,
                   "caption": ["a synthetic clip"]}

    def __len__(self):
        return self.n


@pytest.mark.slow
def test_cli_rl_run_full_step(scorer_root, tmp_path):
    """`run(..., reward_text_fn=...)` executes a complete SFT+reward step
    with in-framework per-prompt text features — the CLI `--enable_rl`
    path (`train_vdm.py:509-691`) with no precomputed artifacts — and
    writes the step-0 decoded-vs-rendered image grid
    (`train_vdm.py:665-688`)."""
    root, _ = scorer_root
    loss_fn, text_fn = cli_vdm.build_reward_fns(root, rcfg=RCFG,
                                                text_cfg=TINY_TEXT)

    DIT = wan_dit.WanDiTConfig(dim=48, ffn_dim=96, num_layers=2, num_heads=4,
                               freq_dim=32, text_dim=24)
    VAE = wan_vae.WanVAEConfig(base_dim=8, z_dim=16, num_res_blocks=1)
    ecfg = tiny_encoder_cfg()
    scfg = ca.StitchedConfig(encoder=ecfg, stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=VAE)
    dit = wan_dit.init(jax.random.key(0), DIT)
    vae = wan_vae.init(jax.random.key(1), VAE)
    stitched = {"encoder": enc_mod.init(jax.random.key(2), ecfg),
                "stitch_conv": ca.init_stitch_conv(jax.random.key(3), scfg)}

    cfg = vdm.VDMTrainConfig(enable_rl=True, rollout_steps_low=3,
                             rollout_steps_high=3)
    state = vdm.init_train_state(jax.random.key(4), dit, cfg)

    def embed_text(prompts):
        k = jax.random.key(abs(hash(tuple(prompts))) % (2 ** 30))
        return jax.random.normal(k, (len(prompts), 5, DIT.text_dim))

    state2, history = cli_vdm.run(
        state, dit, vae, stitched,
        text_loader=_TextLoader(["a photo of a cat"]),
        video_loader=_VideoLoader(1), embed_text=embed_text,
        reward_loss_fn=loss_fn, reward_text_fn=text_fn,
        dit_cfg=DIT, vae_cfg=VAE, scfg=scfg, cfg=cfg, num_steps=1,
        latent_shape=(1, 16, 2, 8, 8), render_size=56,
        save_path=str(tmp_path), save_freq=1000)

    assert int(state2.step) == 1
    assert len(history) == 1
    assert np.isfinite(history[0]["total_loss"])
    assert history[0]["reward_loss"] != 0.0
    # step 0 is an every-10 step → one decoded-vs-rendered grid on disk
    grids = list((tmp_path / "images").glob("step_*.png"))
    assert len(grids) == 1
    import imageio.v2 as imageio
    grid = imageio.imread(grids[0])
    assert grid.ndim == 3 and grid.shape[0] >= 56 and grid.shape[1] >= 56


def test_run_resume_restores_stream_position():
    """`run` resumes the DATA STREAM, not just the state
    (`train_vdm.py:465-496`): at step N the loaders skip N mod len batches
    and their samplers get epoch N // len."""
    calls = {}

    class _Sampler:
        def __init__(self, name):
            self.name = name

        def set_epoch(self, e):
            calls[self.name + "_epoch"] = e

    class _Loader:
        def __init__(self, name, n):
            self.sampler = _Sampler(name)
            self.name, self.n = name, n

        def __len__(self):
            return self.n

        def __iter__(self):
            return iter([])

        def skip_first_batches(self, n):
            calls[self.name + "_skip"] = n
            return self

    state = vdm.VDMTrainState(jnp.asarray(7), None, None, None)
    cli_vdm.run(state, None, None, None,
                text_loader=_Loader("text", 3), video_loader=_Loader("video", 5),
                embed_text=None, reward_loss_fn=None,
                dit_cfg=None, vae_cfg=None, scfg=None,
                cfg=vdm.VDMTrainConfig(enable_rl=False), num_steps=7)
    assert calls == {"text_epoch": 2, "text_skip": 1,
                     "video_epoch": 1, "video_skip": 2}


def test_run_resume_warns_on_sized_less_loader():
    """Resuming with a loader that has no __len__ cannot restore the data
    stream (`train_vdm.py:465-496`) — `run` must WARN instead of silently
    replaying data from the start."""
    import warnings

    class _NoLen:
        def __iter__(self):
            return iter([])

    state = vdm.VDMTrainState(jnp.asarray(7), None, None, None)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cli_vdm.run(state, None, None, None,
                    text_loader=_NoLen(), video_loader=_NoLen(),
                    embed_text=None, reward_loss_fn=None,
                    dit_cfg=None, vae_cfg=None, scfg=None,
                    cfg=vdm.VDMTrainConfig(enable_rl=False), num_steps=7)
    msgs = [str(x.message) for x in w]
    assert any("text loader has no __len__" in m for m in msgs), msgs
    assert any("video loader has no __len__" in m for m in msgs), msgs

    # a FRESH run (step 0) with sized-less loaders stays silent
    state0 = vdm.VDMTrainState(jnp.asarray(0), None, None, None)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cli_vdm.run(state0, None, None, None,
                    text_loader=_NoLen(), video_loader=_NoLen(),
                    embed_text=None, reward_loss_fn=None,
                    dit_cfg=None, vae_cfg=None, scfg=None,
                    cfg=vdm.VDMTrainConfig(enable_rl=False), num_steps=0)
    assert not [x for x in w if "no __len__" in str(x.message)]
