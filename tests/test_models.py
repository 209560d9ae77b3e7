"""Model zoo tests: ViT shapes, KV-cache consistency, multimodal embed
splicing, scan-generation determinism, processor."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kornia_tpu import models as M


TINY = M.VLMConfig(
    vision=M.ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=2),
    text=M.LLMConfig(vocab_size=128, hidden_size=48, intermediate_size=96,
                     num_layers=2, num_heads=4, num_kv_heads=2,
                     max_seq_len=64),
    pixel_shuffle_factor=2,
    image_token_id=100,
)


@pytest.fixture(scope="module")
def vlm():
    return M.build_vlm(TINY, seed=0)


class TestViT:
    def test_shapes(self):
        cfg = TINY.vision
        model = M.VisionTransformer(cfg)
        x = jnp.zeros((2, 56, 56, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 16, 32)  # (56/14)² = 16 patches


class TestLLM:
    def test_kv_cache_matches_full_forward(self):
        """Incremental decode through the cache == one-shot forward."""
        cfg = TINY.text
        model = M.CausalLM(cfg)
        rng = np.random.default_rng(0)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 10)),
                           jnp.int32)
        cache0 = M.KVCache.zeros(cfg, 1)
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 1, cfg.hidden_size)), cache0)

        emb = model.apply(params, toks, method=M.CausalLM.embed_tokens)
        full_logits, _ = model.apply(params, emb, cache0)

        # token-by-token
        cache = cache0
        steps = []
        for t in range(10):
            logits, cache = model.apply(params, emb[:, t: t + 1], cache)
            steps.append(logits[:, 0])
        inc_logits = jnp.stack(steps, axis=1)
        np.testing.assert_allclose(
            np.asarray(full_logits), np.asarray(inc_logits), atol=2e-4)

    def test_causality(self):
        """Changing a future token must not affect earlier logits."""
        cfg = TINY.text
        model = M.CausalLM(cfg)
        cache0 = M.KVCache.zeros(cfg, 1)
        params = model.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 1, cfg.hidden_size)), cache0)
        rng = np.random.default_rng(1)
        toks = rng.integers(0, cfg.vocab_size, (1, 8))
        toks2 = toks.copy()
        toks2[0, -1] = (toks2[0, -1] + 1) % cfg.vocab_size

        def logits_of(t):
            emb = model.apply(params, jnp.asarray(t, jnp.int32),
                              method=M.CausalLM.embed_tokens)
            lg, _ = model.apply(params, emb, cache0)
            return np.asarray(lg)

        a = logits_of(toks)
        b = logits_of(toks2)
        np.testing.assert_allclose(a[:, :-1], b[:, :-1], atol=1e-5)
        assert np.abs(a[:, -1] - b[:, -1]).max() > 1e-4


class TestVLM:
    def test_image_token_splicing(self, vlm):
        model, params = vlm
        cfg = TINY
        n_img = cfg.tokens_per_image
        rng = np.random.default_rng(3)
        toks = np.asarray(
            [1] + [cfg.image_token_id] * n_img + [5, 6, 7], np.int32)[None]
        imgs = rng.standard_normal(
            (1, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)

        feats = model.apply(params, jnp.asarray(imgs),
                            method=SmolVLMEncode)
        emb = model.apply(params, jnp.asarray(toks), feats,
                          method=lambda m, t, f: m.embed_multimodal(t, f))
        # image positions carry image features, text positions don't
        np.testing.assert_allclose(
            np.asarray(emb[0, 1: 1 + n_img]), np.asarray(feats[0]),
            atol=1e-6)

    def test_forward_and_generate(self, vlm):
        model, params = vlm
        cfg = TINY
        rng = np.random.default_rng(4)
        n_img = cfg.tokens_per_image
        toks = np.asarray(
            [1] + [cfg.image_token_id] * n_img + [5, 6], np.int32)[None]
        imgs = rng.standard_normal(
            (1, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)

        res1 = M.generate(model, params, toks, imgs, max_new_tokens=8,
                          eos_token_id=2)
        res2 = M.generate(model, params, toks, imgs, max_new_tokens=8,
                          eos_token_id=2)
        assert res1.tokens.shape == (1, 8)
        np.testing.assert_array_equal(np.asarray(res1.tokens),
                                      np.asarray(res2.tokens))  # greedy

    def test_generation_affected_by_image(self, vlm):
        model, params = vlm
        cfg = TINY
        rng = np.random.default_rng(5)
        n_img = cfg.tokens_per_image
        toks = np.asarray(
            [1] + [cfg.image_token_id] * n_img + [5], np.int32)[None]
        img_a = rng.standard_normal(
            (1, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)
        img_b = -img_a
        ra = M.generate(model, params, toks, img_a, max_new_tokens=6)
        rb = M.generate(model, params, toks, img_b, max_new_tokens=6)
        assert not np.array_equal(np.asarray(ra.tokens),
                                  np.asarray(rb.tokens))

    def test_stream_callback(self, vlm):
        model, params = vlm
        toks = np.asarray([1, 5, 6], np.int32)[None]
        seen = []
        M.generate(model, params, toks, None, max_new_tokens=5,
                   stream_callback=seen.append)
        assert len(seen) >= 1

    def test_load_params_overlay(self, vlm):
        model, params = vlm
        import flax.traverse_util as tu
        flat = tu.flatten_dict(params, sep="/")
        key = next(k for k in flat if k.endswith("connector/kernel"))
        new = np.zeros_like(flat[key])
        p2 = M.load_params(params, {key: new})
        flat2 = tu.flatten_dict(p2, sep="/")
        assert np.all(np.asarray(flat2[key]) == 0)
        with pytest.raises(KeyError):
            M.load_params(params, {"bogus/path": new})


def SmolVLMEncode(model, images):
    return model.encode_images(images)


class TestProcessor:
    def test_preprocess_range(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (100, 160, 3), np.uint8)
        out = M.preprocess_image(img, image_size=56)
        assert out.shape == (1, 56, 56, 3)
        o = np.asarray(out)
        assert o.min() >= -1.001 and o.max() <= 1.001

    def test_tiles(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (400, 800, 3), np.uint8)
        tiles = M.split_into_tiles(img, tile=56, max_tiles=4)
        assert tiles.shape[1:] == (56, 56, 3)
        assert tiles.shape[0] >= 2  # at least one tile + thumbnail

    def test_video_sampling(self):
        idx = M.sample_video_frames(100, 8)
        assert len(idx) == 8 and idx[0] == 0 and idx[-1] == 99
        assert np.all(np.diff(idx) > 0)
        assert len(M.sample_video_frames(3, 8)) == 3
        assert len(M.sample_video_frames(0, 8)) == 0

    def test_prompt_tokens(self):
        t = M.build_prompt_tokens([7, 8], n_image_tokens=3,
                                  image_token_id=100)
        assert t.tolist() == [1, 100, 100, 100, 7, 8]


class TestParamIO:
    def test_npz_roundtrip(self, vlm, tmp_path):
        import jax
        model, params = vlm
        p = str(tmp_path / "weights.npz")
        M.save_params_npz(p, params)
        loaded = M.load_params_npz(p, params)
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(loaded)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
class TestHFWeightParity:
    """Weight-level validation against real HF implementations
    (VERDICT.md missing #8): tiny torch models are instantiated
    locally, their weights converted through models.hf_convert, and
    the logits compared on identical inputs — the same contract a hub
    checkpoint load would exercise, without network."""

    def test_llama_logits_parity(self):
        import numpy as np
        import torch
        import jax.numpy as jnp
        from transformers import LlamaConfig, LlamaForCausalLM

        from kornia_tpu.models.llm import CausalLM, KVCache, LLMConfig
        from kornia_tpu.models.hf_convert import convert_llama_state_dict
        from kornia_tpu.models.vlm import load_params

        torch.manual_seed(0)
        hf_cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            tie_word_embeddings=True, attention_bias=False)
        hf = LlamaForCausalLM(hf_cfg).eval()

        cfg = LLMConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_layers=2,
                        num_heads=4, num_kv_heads=2, max_seq_len=16)
        model = CausalLM(cfg)
        import jax
        tokens = np.array([[3, 17, 99, 5, 42, 7, 0, 11]], np.int32)
        cache = KVCache.zeros(cfg, 1)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 64), jnp.float32), cache)
        upd = convert_llama_state_dict(
            hf.state_dict(), num_layers=2, num_heads=4, num_kv_heads=2)
        params = load_params(params, upd)

        with torch.no_grad():
            ref = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()

        def fwd(p, toks):
            emb = model.apply(p, toks, method=CausalLM.embed_tokens)
            logits, _ = model.apply(p, emb, cache)
            return logits

        ours = np.asarray(fwd(params, jnp.asarray(tokens)))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    def test_siglip_features_parity(self):
        import numpy as np
        import torch
        import jax
        import jax.numpy as jnp
        from transformers import SiglipVisionConfig, SiglipVisionModel

        from kornia_tpu.models.vit import ViTConfig, VisionTransformer
        from kornia_tpu.models.hf_convert import (
            convert_siglip_state_dict)
        from kornia_tpu.models.vlm import load_params

        torch.manual_seed(1)
        hf_cfg = SiglipVisionConfig(
            hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            image_size=28, patch_size=14, layer_norm_eps=1e-6,
            hidden_act="gelu_pytorch_tanh")
        hf = SiglipVisionModel(hf_cfg).eval()

        cfg = ViTConfig(image_size=28, patch_size=14, hidden_size=64,
                        intermediate_size=128, num_layers=2,
                        num_heads=4)
        model = VisionTransformer(cfg)
        rng = np.random.default_rng(0)
        img = rng.normal(0, 1, (1, 28, 28, 3)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
        upd = convert_siglip_state_dict(
            hf.state_dict(), num_layers=2, num_heads=4)
        params = load_params(params, upd)

        with torch.no_grad():
            ref = hf(torch.tensor(img.transpose(0, 3, 1, 2))
                     ).last_hidden_state.numpy()
        ours = np.asarray(model.apply(params, jnp.asarray(img)))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    def test_gemma_logits_parity(self):
        import numpy as np
        import torch
        import jax
        import jax.numpy as jnp
        from transformers import GemmaConfig as HFGemmaConfig
        from transformers import GemmaForCausalLM

        from kornia_tpu.models.gemma import GemmaConfig, GemmaLM
        from kornia_tpu.models.llm import KVCache
        from kornia_tpu.models.hf_convert import convert_gemma_state_dict
        from kornia_tpu.models.vlm import load_params

        torch.manual_seed(2)
        hf_cfg = HFGemmaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=64, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=True,
            attention_bias=False,
            hidden_activation="gelu_pytorch_tanh")
        hf = GemmaForCausalLM(hf_cfg).eval()

        cfg = GemmaConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          max_seq_len=16)
        model = GemmaLM(cfg)
        tokens = np.array([[3, 17, 99, 5, 42, 7, 0, 11]], np.int32)
        cache = KVCache.zeros(cfg, 1)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 64), jnp.float32), cache)
        upd = convert_gemma_state_dict(
            hf.state_dict(), num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16)
        params = load_params(params, upd)

        with torch.no_grad():
            ref = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()

        emb = model.apply(params, jnp.asarray(tokens),
                          method=GemmaLM.embed_tokens)
        ours, _ = model.apply(params, emb, cache)
        np.testing.assert_allclose(np.asarray(ours), ref,
                                   atol=3e-4, rtol=2e-3)

    def test_paligemma_logits_parity(self):
        """Full-model parity: SigLIP tower + projector + Gemma decoder
        with the prefix-LM (bidirectional prefill) mask, vs HF
        PaliGemmaForConditionalGeneration (reference capability:
        crates/kornia-vlm/src/paligemma/)."""
        import numpy as np
        import torch
        import jax
        import jax.numpy as jnp
        from transformers import PaliGemmaConfig as HFPGConfig
        from transformers import PaliGemmaForConditionalGeneration

        from kornia_tpu.models.gemma import GemmaConfig
        from kornia_tpu.models.llm import KVCache
        from kornia_tpu.models.paligemma import (
            PaliGemma, PaliGemmaConfig, build_paligemma)
        from kornia_tpu.models.vit import ViTConfig
        from kornia_tpu.models.hf_convert import (
            convert_paligemma_state_dict)
        from kornia_tpu.models.vlm import load_params

        torch.manual_seed(3)
        hf_cfg = HFPGConfig(
            vision_config=dict(
                hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                image_size=28, patch_size=14,
                hidden_act="gelu_pytorch_tanh"),
            text_config=dict(
                vocab_size=260, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=16,
                max_position_embeddings=64, rope_theta=10000.0,
                rms_norm_eps=1e-6, tie_word_embeddings=True,
                attention_bias=False,
                hidden_activation="gelu_pytorch_tanh"),
            image_token_index=250, projection_dim=64)
        hf = PaliGemmaForConditionalGeneration(hf_cfg).eval()

        cfg = PaliGemmaConfig(
            vision=ViTConfig(image_size=28, patch_size=14,
                             hidden_size=48, intermediate_size=96,
                             num_layers=2, num_heads=4),
            text=GemmaConfig(vocab_size=260, hidden_size=64,
                             intermediate_size=128, num_layers=2,
                             num_heads=4, num_kv_heads=2, head_dim=16,
                             max_seq_len=16),
            image_token_id=250)
        model, params = build_paligemma(cfg)
        upd = convert_paligemma_state_dict(
            hf.state_dict(), num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16,
            vision_layers=2, vision_heads=4)
        params = load_params(params, upd)

        rng = np.random.default_rng(5)
        img = rng.normal(0, 0.5, (1, 28, 28, 3)).astype(np.float32)
        # 4 image placeholder tokens (28/14 squared) + prompt
        tokens = np.array([[250, 250, 250, 250, 2, 17, 42, 9]], np.int32)

        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(tokens.astype(np.int64)),
                pixel_values=torch.tensor(img.transpose(0, 3, 1, 2)),
            ).logits.numpy()

        cache = KVCache.zeros(cfg.text, 1)
        ours, _ = model.apply(params, jnp.asarray(tokens),
                              jnp.asarray(img), cache)
        np.testing.assert_allclose(np.asarray(ours), ref,
                                   atol=3e-4, rtol=2e-3)

    def test_paligemma_generate(self):
        """The shared scan-generation loop drives PaliGemma (same call
        surface as SmolVLM)."""
        import numpy as np
        from kornia_tpu.models.gemma import GemmaConfig
        from kornia_tpu.models.paligemma import (
            PaliGemmaConfig, build_paligemma)
        from kornia_tpu.models.vit import ViTConfig
        from kornia_tpu.models.vlm import generate

        cfg = PaliGemmaConfig(
            vision=ViTConfig(image_size=28, patch_size=14,
                             hidden_size=32, intermediate_size=64,
                             num_layers=1, num_heads=2),
            text=GemmaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=1,
                             num_heads=2, num_kv_heads=1, head_dim=16,
                             max_seq_len=32),
            image_token_id=60)
        model, params = build_paligemma(cfg)
        tokens = np.array([[60, 60, 60, 60, 2, 5]], np.int32)
        img = np.zeros((1, 28, 28, 3), np.float32)
        res = generate(model, params, tokens, img, max_new_tokens=6,
                       eos_token_id=1)
        assert res.tokens.shape == (1, 6)
        assert int(res.n_generated[0]) <= 6


class TestVideoSample:
    """kornia-vlm video.rs parity: VideoSample ring + batched
    preprocess as one jitted program."""

    @staticmethod
    def _clip(tmp_path, n=10, h=40, w=56, fps=20.0):
        from kornia_tpu.io.mjpeg_avi import MjpegWriter

        path = str(tmp_path / "clip.avi")
        yy, xx = np.mgrid[0:h, 0:w]
        with MjpegWriter(path, fps=fps, size_hw=(h, w)) as wtr:
            for i in range(n):
                f = np.stack([xx * 4, yy * 6, np.full((h, w), 10 * i)],
                             -1).astype(np.uint8)
                wtr.write(f)
        return path

    def test_ring_semantics(self):
        from kornia_tpu.models import VideoSample

        v = VideoSample(capacity=3)
        for i in range(5):
            v.add_frame(np.full((4, 4, 3), i, np.uint8), float(i))
        assert len(v) == 3
        # oldest dropped: frames 2, 3, 4 remain
        assert [int(f[0, 0, 0]) for f in v.frames] == [2, 3, 4]
        assert v.metadata.timestamps == [2.0, 3.0, 4.0]

    def test_process_frames_once(self):
        from kornia_tpu.models import VideoSample

        v = VideoSample(capacity=4)
        for i in range(3):
            v.add_frame(np.zeros((4, 4, 3), np.uint8), float(i))
        calls = []
        v.process_frames(lambda f: (calls.append(1), f + 1)[1])
        v.process_frames(lambda f: (calls.append(1), f + 1)[1])
        assert len(calls) == 3  # second pass skips processed frames
        assert int(v.frames[0][0, 0, 0]) == 1

    def test_as_tensor_layout(self):
        from kornia_tpu.models import VideoSample

        v = VideoSample(capacity=4)
        for i in range(2):
            v.add_frame(
                np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3) + i,
                float(i))
        t = v.as_tensor()
        assert t.shape == (2, 3, 4, 6)
        np.testing.assert_allclose(
            np.asarray(t[1]), np.moveaxis(np.asarray(v.frames[1]), -1, 0))

    def test_sample_video_uniform(self, tmp_path):
        from kornia_tpu.io.mjpeg_avi import MjpegReader
        from kornia_tpu.models import preprocess_video, sample_video

        path = self._clip(tmp_path, n=10)
        r = MjpegReader(path)
        s = sample_video(r, n_frames=4)
        assert len(s) == 4
        assert s.metadata.fps == pytest.approx(20.0, abs=0.1)
        assert s.metadata.duration == pytest.approx(0.5, abs=0.01)
        # blue channel encodes the frame index; samples span the clip
        blues = [int(f[0, 0, 2]) for f in s.frames]
        assert blues[0] <= 8 and abs(blues[-1] - 90) <= 8  # JPEG lossy
        batch = preprocess_video(s, image_size=32)
        assert batch.shape == (4, 32, 32, 3)
        assert np.asarray(batch).min() >= -1.001
        assert np.asarray(batch).max() <= 1.001


class TestPresets:
    """Published SmolVLM(2) architecture presets: internal consistency
    (the checkpoints themselves are not fetchable in this env)."""

    def test_preset_consistency(self):
        from kornia_tpu.models import (smolvlm_256m, smolvlm_500m,
                                       smolvlm_2_2b)

        for cfg, tok in ((smolvlm_256m(), 64), (smolvlm_500m(), 64),
                         (smolvlm_2_2b(), 81)):
            assert cfg.tokens_per_image == tok
            assert cfg.text.hidden_size % cfg.text.num_heads == 0
            assert cfg.text.num_heads % cfg.text.num_kv_heads == 0
            assert cfg.vision.hidden_size % cfg.vision.num_heads == 0
            side = cfg.vision.image_size // cfg.vision.patch_size
            assert side % cfg.pixel_shuffle_factor == 0
            assert cfg.image_token_id < cfg.text.vocab_size
