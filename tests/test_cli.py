"""CLI surface parity: every reference README command line parses
(reference README.md:47-88)."""

import pytest

from mla_tpu.core.config import config_from_args


README_COMMANDS = [
    # README.md:50 Normal
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb base "
    "--modulation Normal --epochs 100 --dataset CREMAD",
    # OGM / OGM_GE
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb base "
    "--modulation OGM --epochs 100 --dataset CREMAD",
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb base "
    "--modulation OGM_GE --epochs 100 --dataset CREMAD",
    # QMF
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb base "
    "--modulation QMF --epochs 100 --dataset CREMAD",
    # MLA fixed / dynamic (note the single-dash -dynamic from the README)
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb base "
    "--modulation Normal --epochs 100 --dataset CREMAD --gs_flag",
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb base "
    "--modulation Normal --epochs 100 --dataset CREMAD --gs_flag -dynamic",
    # Food-101 / MVSA m3ae
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb m3ae "
    "--modulation Normal --epochs 100 --dataset Food101 --gs_flag -dynamic",
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb m3ae "
    "--modulation Normal --epochs 100 --dataset MVSA --gs_flag -dynamic",
    # IEMOCAP 3-modal
    "--train --ckpt_path ckpt --gpu_ids 0 --batch_size 64 --lorb m3ae "
    "--modulation Normal --epochs 100 --dataset IEMOCAP --gs_flag -dynamic "
    "--modal3",
    # eval
    "--ckpt_path somepath --gpu_ids 0 --batch_size 64 --lorb base "
    "--modulation Normal --dataset CREMAD --gs_flag",
]


class TestReferenceCLISurface:
    @pytest.mark.parametrize("cmd", README_COMMANDS)
    def test_readme_command_parses(self, cmd):
        cfg = config_from_args(cmd.split())
        assert cfg.batch_size == 64

    def test_dynamic_single_dash(self):
        cfg = config_from_args(["--dataset", "CREMAD", "-dynamic"])
        assert cfg.dynamic

    def test_missing_flags_now_defined(self):
        cfg = config_from_args(["--dataset", "CREMAD", "--mask_percent", "0.3",
                                "--mask_m", "audio", "--ewc_flag"])
        assert cfg.mask_percent == 0.3 and cfg.mask_m == "audio" and cfg.ewc_flag

    def test_invalid_modulation_rejected(self):
        with pytest.raises(SystemExit):
            config_from_args(["--modulation", "bogus"])

    def test_tpu_additions(self):
        cfg = config_from_args(["--dataset", "CREMAD", "--gs_rls",
                                "--no_ghost_updates", "--image_size", "64",
                                "--data_root", "/tmp/x"])
        assert cfg.gs_rls and not cfg.ghost_updates and cfg.image_size == 64
