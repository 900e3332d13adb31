"""CLI argument-surface tests (no device work)."""

import pytest

from cmgan_tpu.cli.enhance import parse_args as enhance_args
from cmgan_tpu.cli.evaluate import parse_args as evaluate_args
from cmgan_tpu.cli.train import parse_args as train_args


def test_train_defaults_match_reference():
    a = train_args(["--data_dir", "/data"])
    assert a.epochs == 120
    assert a.batch_size == 4
    assert a.init_lr == 5e-4
    assert a.decay_epoch == 30
    assert a.cut_len == 32000
    assert a.loss_weights == [0.1, 0.9, 0.2, 0.05]


def test_train_loss_weights_parse_correctly():
    # the reference's argparse type=list would split a string into chars
    a = train_args(["--data_dir", "/d", "--loss_weights", "0.2", "0.8", "0.1", "0.0"])
    assert a.loss_weights == [0.2, 0.8, 0.1, 0.0]


def test_train_requires_data_dir():
    with pytest.raises(SystemExit):
        train_args([])


def test_evaluate_args():
    a = evaluate_args(["--test_dir", "/t", "--json", "--batch", "4"])
    assert a.test_dir == "/t" and a.json and a.batch == 4
    assert not a.exact and not a.save_tracks


def test_enhance_args():
    a = enhance_args(["--input", "a.wav", "--output", "b.wav"])
    assert a.input == "a.wav" and a.output == "b.wav"
    with pytest.raises(SystemExit):
        enhance_args(["--input", "a.wav"])


def test_load_variables_accepts_train_state_checkpoint(tmp_path):
    """evaluate/enhance --model_path must accept BOTH an inference
    {params, batch_stats} checkpoint and a full TrainState checkpoint
    from Trainer.save_checkpoint (generator half extracted)."""
    import dataclasses

    import jax
    import numpy as np

    from cmgan_tpu.checkpoint import save_train_state
    from cmgan_tpu.cli.evaluate import load_variables, parse_args
    from cmgan_tpu.config import CMGANConfig, ModelConfig
    from cmgan_tpu.train import init_train_state

    cfg = CMGANConfig(
        model=ModelConfig(
            num_channels=8, num_tscb_blocks=1, dense_depth=2,
            attn_heads=2, ndf=4,
        )
    )
    state = init_train_state(cfg, seed=0, steps_per_epoch=10)
    path = str(tmp_path / "full_state")
    save_train_state(path, state)
    args = parse_args(["--test_dir", "/unused", "--model_path", path])
    variables = load_variables(cfg, args)
    assert set(variables) == {"params", "batch_stats"}
    a = jax.tree.leaves(state.gen_params)
    b = jax.tree.leaves(variables["params"])
    assert len(a) == len(b)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_train_time_loss_domain_flag_parses():
    a = train_args(["--data_dir", "/x"])
    assert a.time_loss_domain == "reference"  # parity default
    a = train_args(["--data_dir", "/x", "--time_loss_domain", "normalized"])
    assert a.time_loss_domain == "normalized"
    import pytest

    with pytest.raises(SystemExit):
        train_args(["--data_dir", "/x", "--time_loss_domain", "bogus"])
