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
