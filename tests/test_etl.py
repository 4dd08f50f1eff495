"""Offline ETL CLI tests (reference data/*.py equivalents, SURVEY.md §2.3)."""

import os

import numpy as np
import pytest

from mla_tpu.data.etl import cli


def _write_wav(path, seconds=1.0, sr=16000, seed=0):
    from scipy.io import wavfile
    rng = np.random.default_rng(seed)
    data = (rng.standard_normal(int(sr * seconds)) * 0.1 * 32767).astype(
        np.int16)
    wavfile.write(path, sr, data)


class TestAudioETL:
    def test_extract_spec_shapes(self, tmp_path):
        ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
        os.makedirs(ind)
        _write_wav(os.path.join(ind, "a.wav"), seconds=2.0)
        cli.main(["extract-spec", ind, outd, "--seed", "0"])
        spec = np.load(os.path.join(outd, "a.npy"))
        # 5s crop @16k, n_fft 256 hop 128 -> (129, 626) (extract_spec.py:21)
        assert spec.shape == (129, 626)
        assert np.isfinite(spec).all()

    def test_extract_fbank_shapes(self, tmp_path):
        ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
        os.makedirs(ind)
        _write_wav(os.path.join(ind, "b.wav"), seconds=3.0)
        cli.main(["extract-fbank", ind, outd])
        fb = np.load(os.path.join(outd, "b.npy"))
        assert fb.shape == (1024, 128)
        # 3s -> 298 frames real, rest zero-padded (extract_fbank.py:42-52)
        assert np.abs(fb[:290]).sum() > 0 and np.allclose(fb[300:], 0)

    def test_extract_fbank_waveform_mixup(self, tmp_path):
        """--mix_dir/--mix_lambda == wav2fbank(w1, w2, lam), whose mixing law
        is pinned against the torch reference in tests/test_ops.py
        (extract_fbank.py:14-32)."""
        import jax.numpy as jnp
        from mla_tpu.ops.fbank import wav2fbank
        ind, mixd, outd = (str(tmp_path / d) for d in ("in", "mix", "out"))
        os.makedirs(ind), os.makedirs(mixd)
        _write_wav(os.path.join(ind, "c.wav"), seconds=2.0)
        _write_wav(os.path.join(mixd, "c.wav"), seconds=3.0, seed=9)
        cli.main(["extract-fbank", ind, outd, "--mix_dir", mixd,
                  "--mix_lambda", "0.3"])
        fb = np.load(os.path.join(outd, "c.npy"))
        assert fb.shape == (1024, 128)
        w1 = cli._wavread(os.path.join(ind, "c.wav"))[1]
        w2 = cli._wavread(os.path.join(mixd, "c.wav"))[1]
        want = np.asarray(wav2fbank(jnp.asarray(w1), waveform2=jnp.asarray(w2),
                                    mix_lambda=0.3))
        np.testing.assert_allclose(fb, want, rtol=1e-5, atol=1e-5)
        with pytest.raises(SystemExit, match="go together"):
            cli.main(["extract-fbank", ind, outd, "--mix_dir", mixd])


class TestListsETL:
    def test_gen_txt_and_stat_roundtrip(self, tmp_path):
        all_list = str(tmp_path / "all.txt")
        with open(all_list, "w") as f:
            for i in range(20):
                f.write(f"clip{i:02d}.flv LAB{i % 3}\n")
        prefix = str(tmp_path / "my")
        cli.main(["gen-txt", all_list, prefix, "--test_frac", "0.25"])
        train = open(prefix + "_train.txt").readlines()
        test = open(prefix + "_test.txt").readlines()
        assert len(train) == 15 and len(test) == 5
        out = str(tmp_path / "stat.txt")
        cli.main(["gen-stat", prefix + "_train.txt", prefix + "_test.txt",
                  "--out", out, "--sep", " "])
        classes = [ln.strip() for ln in open(out)]
        assert classes == ["LAB0", "LAB1", "LAB2"]


class TestWordPieceHFParity:
    """C++ WordPiece (native/wordpiece.cc) == the reference's actual
    tokenizer algorithm — transformers.BertTokenizer, the pure-Python slow
    class extract_token.py:15 instantiates — constructed OFFLINE from a
    local vocab file (no hub access needed), with extract_token.py:38-50's
    exact call contract (add_special_tokens=False, padding='max_length',
    pm = 1 - attention_mask)."""

    VOCAB = ("[PAD] [UNK] [CLS] [SEP] [MASK] "
             "the un ##aff ##able ##ab ##le hello world don ' t , . ! ? "
             "« » ¿ ¡ · § zero width zerowidth ##width naive uber facade "
             "a b ab abc 1 2 3 ##2 ##3 中 文 ##s cat ##nap catnap").split()

    TEXTS = [
        "Hello, World!",                     # case + ASCII punct splits
        "don't stop",                        # apostrophe split
        "unaffable",                         # greedy longest-match ##pieces
        "the unable",                        # un + ##able vs unable backtrack
        "naïve Über façade",                 # Latin-1 accent strip via lower
        "«quoted» ¿hello? ¡si! a·b §1",      # Latin-1 category-P splits
        "zero​width",                   # ZWSP removed -> one word
        "soft\xadhyphen a⁠b a﻿b",  # Cf removed mid-word
        "a‍b a‪b a\x01b a\x7fb",   # ZWJ/bidi/Cc removed
        "a b a b a　b",        # NBSP/em/ideographic space split
        "中文 abc",                           # CJK chars isolated
        "one-two–three—four",                # hyphen + en/em dash (2013/2014)
        "a" * 101,                           # >100 chars -> [UNK]
        "中" * 101,                           # >100 CODEPOINTS (303 bytes)
        "xyzzy catnap cat catnap",           # unk word + whole-word match
        "123 abc123",                        # digits + wordpiece continuation
        "hello " * 40,                       # truncation past max_length
    ]

    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        from transformers import BertTokenizer
        from mla_tpu.data.wordpiece import WordPieceTokenizer
        p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
        p.write_text("\n".join(self.VOCAB) + "\n")
        return BertTokenizer(str(p), do_lower_case=True), \
            WordPieceTokenizer(str(p))

    @pytest.mark.parametrize("i", range(len(TEXTS)))
    def test_ids_and_pm_match(self, pair, i):
        hf, ours = pair
        text, L = self.TEXTS[i], 32
        enc = hf(text, padding="max_length", truncation=True, max_length=L,
                 return_tensors="np", add_special_tokens=False)
        ids, pm = ours.encode(text, max_length=L)
        np.testing.assert_array_equal(ids[0], enc["input_ids"][0])
        np.testing.assert_array_equal(
            pm[0], 1.0 - enc["attention_mask"][0].astype(np.float32))

    @pytest.mark.parametrize("text", ["", "   \t\n  ", "​\xad"])
    def test_empty_divergence_documented(self, pair, text):
        """Zero-token inputs: transformers' padding='max_length' does NOT pad
        an empty encoding — the reference would np.save a (1, 0) token array
        an (N, 256)-collating DataLoader then crashes on. We write the sane
        fully-padded row (all [PAD], pm all 1) instead."""
        hf, ours = pair
        enc = hf(text, padding="max_length", truncation=True, max_length=32,
                 return_tensors="np", add_special_tokens=False)
        assert enc["input_ids"].shape[1] == 0  # the quirk, pinned
        ids, pm = ours.encode(text, max_length=32)
        assert ids.shape == (1, 32) and (ids == 0).all() and (pm == 1.0).all()


class TestTokenETL:
    def test_extract_token(self, tmp_path):
        try:
            from transformers import BertTokenizer  # noqa: F401
            BertTokenizer.from_pretrained("bert-base-uncased")
        except Exception:
            pytest.skip("bert-base-uncased not cached and no network")
        tsv = str(tmp_path / "texts.tsv")
        with open(tsv, "w") as f:
            f.write("s0\thello world this is a test\n")
        outd = str(tmp_path / "tok")
        cli.main(["extract-token", tsv, outd, "--max_length", "16"])
        tok = np.load(os.path.join(outd, "s0_token.npy"))
        pm = np.load(os.path.join(outd, "s0_pm.npy"))
        assert tok.shape == (1, 16) and pm.shape == (1, 16)
        assert pm[0, 0] == 0 and pm[0, -1] == 1
