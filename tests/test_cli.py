"""CLI entry-point argument/error handling (no heavy model work)."""

import os

import pytest


def test_inference_cli_missing_image(capsys):
    from mit_tpu.decode.cli import main

    rc = main(["--image_path", "/definitely/not/there.jpg"])
    assert rc == 1
    assert "not found" in capsys.readouterr().err


def test_inference_cli_no_checkpoint(tmp_path, capsys):
    from PIL import Image

    from mit_tpu.decode.cli import main

    img = tmp_path / "x.jpg"
    Image.new("RGB", (8, 8)).save(img)
    rc = main(["--image_path", str(img), "--data_dir", str(tmp_path)])
    assert rc == 1
    assert "checkpoint" in capsys.readouterr().err.lower()


def test_inference_cli_rejects_bad_method(tmp_path):
    from mit_tpu.decode.cli import main

    with pytest.raises(SystemExit):
        main(["--image_path", "x.jpg", "--method", "nucleus"])


def test_evaluate_cli_missing_checkpoint(tmp_path, capsys):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "evaluate_cli",
        os.path.join(os.path.dirname(__file__), "..", "evaluate.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["--checkpoint_path", "/nope.safetensors"])
    assert rc == 1


def test_upload_cli_missing_file(capsys):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "upload_cli",
        os.path.join(os.path.dirname(__file__), "..", "upload_model.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["/definitely/not/a/file.safetensors"])
    assert rc == 1
    assert "not found" in capsys.readouterr().err.lower()


def test_train_cli_flag_parsing(monkeypatch):
    """Flags override config; train() receives the overridden values."""
    from mit_tpu.train import cli

    captured = {}

    def fake_train(cfg, auto_prepare, wandb_enabled):
        captured.update(
            data=cfg.DATA_DIR, epochs=cfg.NUM_EPOCHS, bs=cfg.BATCH_SIZE,
            lr=cfg.LEARNING_RATE, mesh=cfg.MESH_SHAPE, cache=cfg.CACHE_ENCODER_FEATURES,
            auto=auto_prepare, wandb=wandb_enabled,
        )
        return {"best_val_loss": 1.0, "epochs": [], "best_checkpoint": None}

    import mit_tpu.train.loop as loop

    monkeypatch.setattr(loop, "train", fake_train)
    rc = cli.main([
        "--data_dir", "/tmp/x/", "--epochs", "7", "--batch_size", "16",
        "--learning_rate", "0.001", "--mesh", "4,2", "--no_cache",
        "--no_prepare", "--no_wandb",
    ])
    assert rc == 0
    assert captured == {
        "data": "/tmp/x/", "epochs": 7, "bs": 16, "lr": 0.001,
        "mesh": (4, 2), "cache": False, "auto": False, "wandb": False,
    }
