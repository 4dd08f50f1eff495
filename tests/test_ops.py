"""Kernel golden tests (SURVEY.md §4): STFT vs torch.stft (librosa-equivalent),
Kaldi fbank vs an independent numpy implementation, image pipeline vs PIL/torch
semantics, attention kernel vs the naive einsum reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mla_tpu.ops import attention, fbank, image, pos_embed, specaug, stft


class TestStft:
    def test_matches_torch_stft(self):
        # torch.stft(center=True, pad_mode='constant', hann periodic) ==
        # librosa.stft under the PINNED librosa==0.10.0.post2 (its default
        # pad_mode changed from 'reflect' to zero padding in 0.10)
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal(16000 * 5).astype(np.float32)
        ours = np.asarray(stft.log_stft(jnp.asarray(x)))
        ref = torch.stft(torch.from_numpy(x), n_fft=256, hop_length=128,
                         window=torch.hann_window(256, periodic=True),
                         center=True, pad_mode="constant",
                         return_complex=True)
        ref = np.log(np.abs(ref.numpy()) + 1e-7)
        assert ours.shape == (129, 626)
        # log-domain comparison: tiny magnitudes amplify fp32 fft differences
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_batched(self):
        x = np.random.default_rng(1).standard_normal((3, 80000)).astype(np.float32)
        out = stft.log_stft(jnp.asarray(x))
        assert out.shape == (3, 129, 626)


def _numpy_kaldi_fbank(wave, sr=16000, num_bins=128):
    """Independent numpy port of Kaldi fbank math (dither=0, hanning,
    snip_edges, preemph 0.97, remove_dc, 512-pt FFT, mel 20..nyquist)."""
    win, shift, padded = 400, 160, 512
    m = 1 + (len(wave) - win) // shift
    frames = np.stack([wave[i * shift:i * shift + win] for i in range(m)]).astype(np.float64)
    frames -= frames.mean(axis=1, keepdims=True)
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - 0.97 * pre
    n = np.arange(win)
    frames *= 0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))
    frames = np.pad(frames, ((0, 0), (0, padded - win)))
    spec = np.fft.rfft(frames, axis=1)
    power = np.abs(spec) ** 2

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)
    fft_freqs = np.arange(padded // 2 + 1) * sr / padded
    mlo, mhi = mel(20.0), mel(sr / 2.0)
    delta = (mhi - mlo) / (num_bins + 1)
    out = np.zeros((m, num_bins))
    melf = mel(fft_freqs)
    for j in range(num_bins):
        left, center, right = mlo + j * delta, mlo + (j + 1) * delta, mlo + (j + 2) * delta
        up = (melf - left) / (center - left)
        down = (right - melf) / (right - center)
        w = np.where((melf > left) & (melf <= center), up,
                     np.where((melf > center) & (melf < right), down, 0.0))
        w[-1] = 0.0  # kaldi computes banks over bins [0, padded//2)
        out[:, j] = power @ w
    return np.log(np.maximum(out, np.finfo(np.float32).eps))


class TestFbank:
    def test_matches_numpy_kaldi(self):
        rng = np.random.default_rng(2)
        wave = rng.standard_normal(16000).astype(np.float32) * 0.1
        ours = np.asarray(fbank.kaldi_fbank(jnp.asarray(wave)))
        ref = _numpy_kaldi_fbank(wave)
        assert ours.shape == ref.shape == (98, 128)
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_wav2fbank_pads_to_1024(self):
        wave = np.random.default_rng(3).standard_normal(32000).astype(np.float32)
        out = fbank.wav2fbank(jnp.asarray(wave))
        assert out.shape == (1024, 128)
        # frames beyond the signal are zero-padded
        assert np.allclose(np.asarray(out)[300:], 0.0)

    @pytest.mark.parametrize("n2", [12000, 16000, 20000])
    def test_mix_waveforms_matches_torch_reference(self, n2):
        """Mixing law == the reference's torch lines verbatim
        (extract_fbank.py:14-32), for w2 shorter / equal / longer than w1."""
        import torch
        rng = np.random.default_rng(11)
        w1 = rng.standard_normal(16000).astype(np.float32)
        w2 = rng.standard_normal(n2).astype(np.float32)
        lam = 0.37

        t1, t2 = torch.tensor(w1)[None], torch.tensor(w2)[None]
        t1 = t1 - t1.mean()
        t2 = t2 - t2.mean()
        if t1.shape[1] != t2.shape[1]:
            if t1.shape[1] > t2.shape[1]:
                tmp = torch.zeros(1, t1.shape[1])
                tmp[0, :t2.shape[1]] = t2
                t2 = tmp
            else:
                t2 = t2[0, :t1.shape[1]]
        mix = lam * t1 + (1 - lam) * t2
        want = (mix - mix.mean()).numpy().reshape(-1)

        got = np.asarray(fbank.mix_waveforms(jnp.asarray(w1), jnp.asarray(w2),
                                             lam))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestImage:
    def test_resize_center_crop_box_roundtrip(self):
        # 480x640 -> Resize(256) short side -> CenterCrop(224):
        i, j, h, w = image.resize_center_crop_box(480, 640, 256, 224)
        assert h == w == pytest.approx(224 * 480 / 256)
        assert i == pytest.approx((480 - h) / 2)

    def test_crop_resize_normalize_shapes_and_values(self):
        imgs = np.full((2, 64, 48, 3), 128, dtype=np.uint8)
        boxes = np.array([[0, 0, 64, 48], [16, 8, 32, 32]], dtype=np.float32)
        flip = np.array([False, True])
        out = image.crop_resize_normalize(
            jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(flip),
            jnp.asarray(image.IMAGENET_MEAN), jnp.asarray(image.IMAGENET_STD),
            out_hw=(224, 224))
        assert out.shape == (2, 3, 224, 224)
        expect = (128 / 255.0 - image.IMAGENET_MEAN) / image.IMAGENET_STD
        np.testing.assert_allclose(np.asarray(out)[0, :, 100, 100], expect, atol=1e-5)

    def test_random_resized_crop_params_in_bounds(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            i, j, h, w = image.random_resized_crop_params(rng, 100, 150)
            assert 0 <= i <= 100 - h and 0 <= j <= 150 - w and h > 0 and w > 0

    def test_patchify_matches_einops(self):
        einops = pytest.importorskip("einops")
        x = np.random.default_rng(4).standard_normal((2, 3, 32, 32)).astype(np.float32)
        ours = np.asarray(image.patchify(jnp.asarray(x), 16))
        ref = einops.rearrange(x, "b c (h p1) (w p2) -> b (h w) (c p1 p2)", p1=16, p2=16)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestSpecAug:
    def test_masks_and_preserves_shape(self):
        x = jnp.ones((2, 1024, 128))
        out = specaug.augment_fbank_batch(jax.random.key(0), x, noise=False)
        out = np.asarray(out)
        assert out.shape == (2, 1024, 128)
        assert (out == 0).any() and (out == 1).any()

    def test_noise_roll_changes_values(self):
        x = jnp.zeros((1, 1024, 128))
        out = np.asarray(specaug.augment_fbank_batch(jax.random.key(1), x, noise=True))
        assert np.abs(out).max() < 0.1 and np.abs(out).max() > 0


class TestPosEmbed:
    def test_1d_shape_and_values(self):
        emb = pos_embed.get_1d_sincos_pos_embed(768, 256)
        assert emb.shape == (1, 256, 768)
        np.testing.assert_allclose(emb[0, 0, :384], 0.0, atol=1e-7)   # sin(0)
        np.testing.assert_allclose(emb[0, 0, 384:], 1.0, atol=1e-7)   # cos(0)

    def test_2d_square(self):
        emb = pos_embed.get_2d_sincos_pos_embed_square(768, 256)
        assert emb.shape == (1, 256, 768)

    def test_2d_rect_audio_grid(self):
        emb = pos_embed.get_2d_sincos_pos_embed_rect(768, 8, 64)
        assert emb.shape == (512, 768)


class TestAttention:
    def _rand_qkv(self, b=2, h=4, s=37, d=16, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
        return mk(), mk(), mk()

    def test_reference_softmax_masking(self):
        q, k, v = self._rand_qkv()
        mask = np.zeros((2, 37), np.float32)
        mask[:, 30:] = 1.0
        out = attention.attention_reference(q, k, v, jnp.asarray(mask))
        # masked keys contribute (almost) nothing: recompute without them
        out2 = attention.attention_reference(q[..., :30, :], k[..., :30, :],
                                             v[..., :30, :])
        np.testing.assert_allclose(np.asarray(out[..., :30, :]),
                                   np.asarray(out2), atol=1e-4)

    def test_pallas_matches_reference_interpret(self):
        q, k, v = self._rand_qkv(b=2, h=2, s=200, d=64, seed=1)
        mask = np.zeros((2, 200), np.float32)
        mask[0, 150:] = 1.0
        ours = attention.flash_attention(q, k, v, jnp.asarray(mask), interpret=True)
        ref = attention.attention_reference(q, k, v, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_pallas_backward_matches_reference_grads(self):
        q, k, v = self._rand_qkv(b=2, h=2, s=200, d=64, seed=3)
        mask = np.zeros((2, 200), np.float32)
        mask[0, 150:] = 1.0
        mask_j = jnp.asarray(mask)
        rng = np.random.default_rng(4)
        do = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

        dq, dk, dv = attention.flash_attention_bwd(q, k, v, do, mask_j,
                                                   interpret=True)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: attention.attention_reference(q_, k_, v_, mask_j),
            q, k, v)
        rdq, rdk, rdv = vjp(do)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=3e-5)

    def test_pallas_no_mask(self):
        q, k, v = self._rand_qkv(b=1, h=2, s=128, d=64, seed=2)
        ours = attention.flash_attention(q, k, v, interpret=True)
        ref = attention.attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_head_chunk_divisors(self):
        # largest divisor of H whose fp32 score tensors fit the budget
        assert attention._head_chunk(12, 384, n_live=2) == 6
        assert attention._head_chunk(12, 640, n_live=2) == 2
        assert attention._head_chunk(12, 640, n_live=3) == 1
        assert attention._head_chunk(7, 384, n_live=2) == 1   # prime H
        assert attention._head_chunk(16, 128, n_live=2) == 16

    def test_prime_head_count(self):
        # GH=1 path: head counts that divide nothing still work
        q, k, v = self._rand_qkv(b=1, h=3, s=100, d=32, seed=5)
        mask = jnp.zeros((1, 100), jnp.float32).at[:, 80:].set(1.0)
        ours = attention.flash_attention(q, k, v, mask, interpret=True)
        ref = attention.attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5)

    def test_long_sequence_qblockwise_fallback(self, monkeypatch):
        """Sequences whose scores outgrow the VMEM budget take the
        q-blockwise kernel; same numerics (long-context path, SURVEY §5.7).
        The budget is shrunk so the fallback engages at test-size shapes."""
        monkeypatch.setattr(attention, "_SCORE_VMEM_BUDGET", 1024)
        q, k, v = self._rand_qkv(b=1, h=2, s=160, d=32, seed=6)
        mask = jnp.zeros((1, 160), jnp.float32).at[:, 130:].set(1.0)
        ours = attention.flash_attention(q, k, v, mask, interpret=True)
        ref = attention.attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5)
        # and the auto VJP policy never picks a Pallas bwd that can't fit
        assert not attention._use_pallas_bwd(2000)
        assert attention._use_pallas_bwd(513)

    def test_bwd_long_sequence_raises_actionable(self, monkeypatch):
        """flash_attention_bwd has no q-blockwise fallback; beyond the VMEM
        budget it must fail loud at trace time, not at Mosaic compile
        (ADVICE r2). The budget is shrunk so the guard fires at test shapes."""
        monkeypatch.setattr(attention, "_SCORE_VMEM_BUDGET", 1024)
        q, k, v = self._rand_qkv(b=1, h=2, s=160, d=32, seed=7)
        mask = jnp.zeros((1, 160), jnp.float32)
        with pytest.raises(ValueError, match="VMEM budget"):
            attention.flash_attention_bwd(q, k, v, q, mask, interpret=True)

    def test_keep_dims_rejects_opaque_shardings(self):
        """Non-NamedShardings must not pass through the partitioning rules:
        an opaque spec could hide a split sequence dim and the per-shard
        kernel would softmax over a subset of keys (ADVICE r2)."""
        class Opaque:
            pass
        with pytest.raises(TypeError, match="NamedSharding"):
            attention._keep_dims(Opaque(), {0, 1})


class TestFlatAttention:
    """Transpose-free flat-layout kernels (round-3): consume the qkv GEMM
    output (B,S,3C) directly, emit (B,S,C) — must match the reference
    attention math exactly (fwd + bwd), including mask semantics."""

    def _qkv(self, b=2, s=37, h=3, d=32, seed=0):
        rng = np.random.default_rng(seed)
        qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)), jnp.float32)
        mask = jnp.zeros((b, s), jnp.float32).at[:, 30:].set(1.0)
        return qkv, mask, h, d

    def _ref(self, qkv, mask, h, d):
        b, s, _ = qkv.shape
        parts = jnp.transpose(qkv.reshape(b, s, 3, h, d), (2, 0, 3, 1, 4))
        out = attention.attention_reference(parts[0], parts[1], parts[2],
                                            mask)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, s, h * d)

    def test_forward_matches_reference(self):
        qkv, mask, h, d = self._qkv()
        ours = attention.flash_attention_flat(qkv, mask, h, interpret=True)
        np.testing.assert_allclose(np.asarray(ours),
                                   np.asarray(self._ref(qkv, mask, h, d)),
                                   atol=2e-5)

    def test_backward_matches_reference_grads(self):
        qkv, mask, h, d = self._qkv(seed=3)
        g = jnp.asarray(np.random.default_rng(4).standard_normal(
            (qkv.shape[0], qkv.shape[1], h * d)), jnp.float32)
        _, vjp = jax.vjp(lambda q_: self._ref(q_, mask, h, d), qkv)
        (dqkv_ref,) = vjp(g)
        dq, dk, dv = attention.flash_attention_flat_bwd(
            qkv, g, mask, h, interpret=True)
        dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
        np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                                   atol=3e-5)

    def test_fused_attention_qkv_fallback_path(self):
        # off-TPU the dispatcher takes the reshape/transpose route — same
        # numbers as the flat kernel
        qkv, mask, h, d = self._qkv(seed=7)
        out = attention.fused_attention_qkv(qkv, mask, h)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(self._ref(qkv, mask, h, d)),
                                   atol=2e-5)

    def test_flat_head_chunk_bounds(self):
        # per-head scores too big -> 0 (caller falls back)
        assert attention._flat_head_chunk(12, 4096, 64, 4, 7) == 0
        # base shape: full-H chunks fit
        assert attention._flat_head_chunk(12, 264, 64, 4, 7) == 12
        assert attention.flat_attention_fits(12, 257, 64)
        assert not attention.flat_attention_fits(12, 4096, 64)
        # fp32 operands double the block footprint: the gh the bf16
        # accounting picks must shrink (or vanish) under itemsize=4 —
        # under-accounting here reproduced a Mosaic scoped-VMEM OOM
        gh16 = attention._flat_head_chunk(16, 520, 64, n_live=4, n_bufs=7,
                                          itemsize=2)
        gh32 = attention._flat_head_chunk(16, 520, 64, n_live=4, n_bufs=7,
                                          itemsize=4)
        assert gh32 < gh16
