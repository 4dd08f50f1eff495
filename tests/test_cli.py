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

    def test_av_alpha_default_is_055(self):
        # reference __main__ calls main(av_alpha=0.55) (main.py:968),
        # overriding the function default 0.5 — omitted flag must give 0.55
        cfg = config_from_args(["--dataset", "CREMAD"])
        assert cfg.av_alpha == 0.55

    @pytest.mark.parametrize("argv", [
        ["--dataset", "CREMAD", "--av_alpha", "0.4"],
        ["--dataset", "CREMAD", "--av_alpha=0.4"],  # the form a raw scan missed
    ])
    def test_av_alpha_explicit_wins(self, argv):
        assert config_from_args(argv).av_alpha == 0.4

    def test_use_tensorboard_can_be_disabled(self):
        # reference main.py:43 used type=bool: any non-empty string parsed
        # True, so it could never be turned off from the CLI
        cfg = config_from_args(["--dataset", "CREMAD", "--no-use_tensorboard"])
        assert not cfg.use_tensorboard
        assert config_from_args(["--dataset", "CREMAD"]).use_tensorboard

    def test_modal3_requires_m3ae(self):
        # base/large would pair a 2-modal model with the 3-modal adapter
        with pytest.raises(ValueError, match="modal3 requires"):
            config_from_args(["--dataset", "IEMOCAP", "--modal3",
                              "--lorb", "base"])

    def test_gated_film_rejected_even_with_gs(self):
        # declared but never constructed in the reference
        # (basic_model.py:35-38) — including under gs_flag
        for extra in ([], ["--gs_flag"]):
            with pytest.raises(NotImplementedError):
                config_from_args(["--dataset", "CREMAD",
                                  "--fusion_method", "gated"] + extra)

    def test_tpu_additions(self):
        cfg = config_from_args(["--dataset", "CREMAD", "--gs_rls",
                                "--no_ghost_updates", "--image_size", "64",
                                "--data_root", "/tmp/x"])
        assert cfg.gs_rls and not cfg.ghost_updates and cfg.image_size == 64

    def test_cav_knobs(self):
        cfg = config_from_args(["--dataset", "CREMAD", "--lorb", "large",
                                "--audio_length", "256",
                                "--cav_blocks", "1,1"])
        assert cfg.audio_length == 256 and cfg.cav_blocks == (1, 1)
        # default = reference (cav_mae.py:117-139)
        d = config_from_args(["--dataset", "CREMAD", "--lorb", "large"])
        assert d.audio_length == 1024 and d.cav_blocks == (11, 12)
        # patches_a must land on the 8-row sin-cos grid
        with pytest.raises(ValueError, match="audio_length"):
            config_from_args(["--dataset", "CREMAD", "--lorb", "large",
                              "--audio_length", "100"])
        # msd <= depth, exactly two entries
        for bad in ("3,1", "1", "1,2,3"):
            with pytest.raises(ValueError, match="cav_blocks"):
                config_from_args(["--dataset", "CREMAD", "--lorb", "large",
                                  "--cav_blocks", bad])
