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


class TestPreprocessIemo:
    """One-shot IEMOCAP recipe (preprocess_iemo.py:14-181): per split,
    fbank + token/pm + resized face crops land exactly where the IEMOCAP
    adapter layout (datalists.py LAYOUTS) reads them."""

    def test_one_shot_layout(self, tmp_path):
        from PIL import Image
        lists = tmp_path / "lists"
        audio = tmp_path / "subaudio"
        faces = tmp_path / "faces" / "clip0"
        root = tmp_path / "root"
        for d in (lists, audio, faces):
            d.mkdir(parents=True)
        sep = " [split|sign] "
        (lists / "my_train_iemo.txt").write_text(
            f"clip0.mp4{sep}hello world{sep}ang\n"
            f"clip1.mp4{sep}the unable{sep}neu\n")   # clip1: no wav/faces
        _write_wav(str(audio / "clip0.wav"), seconds=1.0)
        Image.new("RGB", (40, 30), (200, 10, 10)).save(faces / "f0.jpg")
        Image.new("RGB", (64, 64), (10, 200, 10)).save(faces / "f1.png")
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(TestWordPieceHFParity.VOCAB) + "\n")

        cli.main(["preprocess-iemo", str(lists), str(audio), str(faces.parent),
                  str(root), "--splits", "train,dev", "--target_length", "64",
                  "--max_length", "16", "--vocab", str(vocab)])

        fb = np.load(root / "audio" / "train_fbank" / "clip0.npy")
        assert fb.shape == (64, 128) and np.isfinite(fb).all()
        tok = np.load(root / "text_token" / "train_token" / "clip0_token.npy")
        pm = np.load(root / "text_token" / "train_token" / "clip0_pm.npy")
        assert tok.shape == (1, 16) and pm.shape == (1, 16)
        assert pm[0, 0] == 0 and pm[0, -1] == 1
        for out_name in ("f0.jpg", "f1.jpg"):   # png re-encodes to jpg
            img = Image.open(root / "visual" / "train_imgs" / "clip0"
                             / out_name)
            assert img.size == (256, 256)
        # clip1: missing wav -> extract_fbank.py:38-40 fallback artifact;
        # missing face dir -> skipped with a message, no dir created
        fb1 = np.load(root / "audio" / "train_fbank" / "clip1.npy")
        assert fb1.shape == (64, 128) and np.allclose(fb1, 0.01)
        assert not (root / "visual" / "train_imgs" / "clip1").exists()
        # dev split: no datalist -> skipped cleanly
        assert not (root / "audio" / "dev_fbank" / "clip0.npy").exists()

    def test_matches_standalone_subcommands(self, tmp_path):
        """Composition law: preprocess-iemo's fbank == extract-fbank's,
        tokens == extract-token's — one set of transform laws."""
        lists = tmp_path / "lists"
        audio = tmp_path / "subaudio"
        root = tmp_path / "root"
        lists.mkdir(); audio.mkdir()
        sep = " [split|sign] "
        (lists / "my_test_iemo.txt").write_text(
            f"c.mp4{sep}hello world{sep}hap\n")
        _write_wav(str(audio / "c.wav"), seconds=1.0, seed=3)
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(TestWordPieceHFParity.VOCAB) + "\n")
        cli.main(["preprocess-iemo", str(lists), str(audio),
                  str(tmp_path / "nofaces"), str(root), "--splits", "test",
                  "--target_length", "32", "--max_length", "8",
                  "--vocab", str(vocab)])
        # standalone equivalents
        cli.main(["extract-fbank", str(audio), str(tmp_path / "fb"),
                  "--target_length", "32"])
        tsv = tmp_path / "texts.tsv"
        tsv.write_text("c\thello world\n")
        cli.main(["extract-token", str(tsv), str(tmp_path / "tok"),
                  "--max_length", "8", "--vocab", str(vocab)])
        np.testing.assert_array_equal(
            np.load(root / "audio" / "test_fbank" / "c.npy"),
            np.load(tmp_path / "fb" / "c.npy"))
        np.testing.assert_array_equal(
            np.load(root / "text_token" / "test_token" / "c_token.npy"),
            np.load(tmp_path / "tok" / "c_token.npy"))
        np.testing.assert_array_equal(
            np.load(root / "text_token" / "test_token" / "c_pm.npy"),
            np.load(tmp_path / "tok" / "c_pm.npy"))
