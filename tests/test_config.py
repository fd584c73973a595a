"""Config system tests: YAML parent inheritance, CLI>YAML>defaults
precedence, unknown-field rejection, and builder round-trips.

Parity target: wisp/config_parser.py:155-246 in the reference."""
import os

import pytest

from shacira_tpu import config as cfg_mod


def nerf_parser():
    return cfg_mod.add_nerf_args(cfg_mod.build_image_parser())


def test_shipped_nerf_lego_yaml_parses_and_builds():
    parser = nerf_parser()
    args = cfg_mod.parse_args(parser, ['--config', 'configs/nerf_lego.yaml'])
    assert args.num_lods == 24
    assert args.codebook_bitwidth == 19
    assert args.raymarch_type == 'ray' and args.num_steps == 2048
    mcfg = cfg_mod.build_nerf_model_config(args)
    assert mcfg.grid.num_lods == 24 and mcfg.grid.resolution_dim == 3
    tcfg = cfg_mod.build_tracer_config(args)
    assert tcfg.num_steps == 2048 and tcfg.max_samples == 1048576
    trcfg = cfg_mod.build_nerf_trainer_config(args)
    assert trcfg.prune_every == args.prune_every


def test_reference_yaml_also_loads():
    """The reference repo's own YAML files must parse directly."""
    ref = '/root/reference/app/nerf/configs/nerf_lego.yaml'
    if not os.path.exists(ref):
        pytest.skip('reference not mounted')
    parser = nerf_parser()
    args = cfg_mod.parse_args(parser, ['--config', ref])
    assert args.num_lods == 24 and args.codebook_bitwidth == 19


def test_cli_overrides_yaml():
    parser = nerf_parser()
    args = cfg_mod.parse_args(
        parser, ['--config', 'configs/nerf_lego.yaml', '--num-lods', '8'])
    assert args.num_lods == 8                      # CLI wins
    assert args.codebook_bitwidth == 19            # YAML still applies


def test_unknown_yaml_field_raises(tmp_path):
    bad = tmp_path / 'bad.yaml'
    bad.write_text('grid:\n    not_a_real_option: 3\n')
    parser = nerf_parser()
    with pytest.raises(ValueError, match='not a valid option'):
        cfg_mod.parse_args(parser, ['--config', str(bad)])


def test_new_tpu_native_flags_reach_configs():
    """segment/adaptive-budget/resample flags must flow into dataclasses."""
    parser = nerf_parser()
    args = cfg_mod.parse_args(parser, [
        '--segment-size', '16', '--seg-budget', '4096',
        '--coarse-level', '4', '--seg-dilation', '2',
        '--adaptive-budget', '1', '--budget-headroom', '2.0',
        '--min-budget', '1024', '--random-lod', '1',
        '--resample', '1', '--resample-every', '3'])
    tcfg = cfg_mod.build_tracer_config(args)
    assert (tcfg.segment_size, tcfg.seg_budget, tcfg.coarse_level,
            tcfg.seg_dilation) == (16, 4096, 4, 2)
    trcfg = cfg_mod.build_nerf_trainer_config(args)
    assert trcfg.adaptive_budget and trcfg.budget_headroom == 2.0
    assert trcfg.min_budget == 1024 and trcfg.random_lod
    icfg = cfg_mod.build_image_trainer_config(args)
    assert icfg.resample and icfg.resample_every == 3


def test_image_kodak_yaml_builds():
    parser = cfg_mod.build_image_parser()
    args = cfg_mod.parse_args(parser, ['--config', 'configs/kodak.yaml'])
    mcfg = cfg_mod.build_image_model_config(args)
    assert mcfg.grid.resolution_dim == 2
    tr = cfg_mod.build_image_trainer_config(args)
    assert tr.epochs == args.epochs
