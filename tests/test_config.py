"""Config system: reference YAML schema, dotted overrides, YAML-1.1 numbers."""

import pytest

from fast_srgan_tpu.config import ConfigNode, apply_overrides, default_config, load_config


class TestSchema:
    def test_reference_schema_loads(self, tmp_path):
        # A YAML with exactly the reference's keys must load unchanged and
        # gain the TPU sections as defaults.
        y = tmp_path / "c.yaml"
        y.write_text(
            "experiment:\n  name: X\n  seed: 7\n"
            "data:\n  image_dir: /d\n  numpy_dir: /n\n  lr_image_size: 24\n"
            "  scale_factor: 4\n"
            "generator:\n  n_filters: 64\n  n_layers: 8\n"
            "discriminator:\n  n_filters: 64\n  n_layers: 7\n"
            "training:\n  compiled: false\n  pretrain_iterations: 100\n"
            "  iterations: 100\n  device: mps\n  log_iter: 5000\n"
            "  checkpoint_iter: 5000\n  batch_size: 24\n  num_workers: 16\n"
            "  generator_lr: 1e-4\n  discriminator_lr: 1e-4\n"
        )
        c = load_config(str(y))
        assert c.experiment.name == "X"
        assert c.generator.n_layers == 8
        assert isinstance(c.training.generator_lr, float)  # YAML-1.1 trap
        assert c.training.generator_lr == 1e-4
        assert c.parallel.data_axis == "data"  # injected defaults
        assert c.kernels.use_pallas is False

    def test_missing_file_gives_defaults(self):
        c = load_config("/nonexistent/path.yaml")
        assert c.generator.n_filters == 64


class TestOverrides:
    def test_dotted_override_types(self):
        c = default_config()
        apply_overrides(
            c,
            [
                "generator.n_layers=12",
                "training.generator_lr=2e-4",
                "experiment.name=run2",
                "training.bf16=false",
            ],
        )
        assert c.generator.n_layers == 12
        assert c.training.generator_lr == 2e-4
        assert c.experiment.name == "run2"
        assert c.training.bf16 is False

    def test_new_key_requires_plus_prefix(self):
        # Hydra semantics: unknown keys are typos unless explicitly added.
        c = default_config()
        apply_overrides(c, ["+extra.nested.key=3"])
        assert c.extra.nested.key == 3
        with pytest.raises(KeyError, match="Unknown config"):
            apply_overrides(default_config(), ["extr.nested.key=3"])
        with pytest.raises(KeyError, match="Unknown config"):
            apply_overrides(default_config(), ["training.batch_sze=8"])

    def test_hydra_keys_always_accepted(self):
        c = default_config()
        apply_overrides(c, ["hydra.run.dir=/tmp/x"])
        assert c.hydra.run.dir == "/tmp/x"

    def test_malformed_override_raises(self):
        with pytest.raises(ValueError, match="key.path=value"):
            apply_overrides(default_config(), ["training.batch_size"])

    def test_attribute_access_and_missing(self):
        c = ConfigNode({"a": {"b": 1}})
        assert c.a.b == 1
        with pytest.raises(AttributeError):
            _ = c.a.missing


class TestActualReferenceConfig:
    def test_mounted_reference_yaml_loads_verbatim(self):
        # Not a synthetic copy: the reference repo's own config file must
        # load unchanged (YAML-1.1 '1e-4' coerced to float, the unused
        # training.device key tolerated, TPU defaults injected).
        import os
        path = "/root/reference/configs/config.yaml"
        if not os.path.exists(path):
            import pytest
            pytest.skip("reference not mounted")
        from fast_srgan_tpu.config import load_config
        cfg = load_config(path)
        assert cfg.generator.n_filters == 64 and cfg.generator.n_layers == 8
        assert isinstance(cfg.training.generator_lr, float)
        assert cfg.training.generator_lr == 1e-4
        assert cfg.data.lr_image_size == 24 and cfg.data.scale_factor == 4
        assert cfg.kernels.use_pallas is False  # injected default


class TestConfigRobustness:
    def test_empty_yaml_section_keeps_defaults(self, tmp_path):
        y = tmp_path / "c.yaml"
        y.write_text("kernels:\n# all keys commented out\ngenerator:\n  n_filters: 32\n")
        c = load_config(str(y))
        assert c.kernels.use_pallas is False  # defaults survive, not None
        assert c.generator.n_filters == 32

    def test_required_missing_path_raises(self):
        with pytest.raises(FileNotFoundError, match="config file not found"):
            load_config("/nonexistent/path.yaml", required=True)

    def test_quoted_numeric_strings_stay_strings(self, tmp_path):
        y = tmp_path / "c.yaml"
        y.write_text('experiment:\n  name: "2024"\ntraining:\n  generator_lr: 1e-4\n')
        c = load_config(str(y))
        assert c.experiment.name == "2024" and isinstance(c.experiment.name, str)
        assert c.training.generator_lr == 1e-4  # YAML-1.1 sci-notation fixed


class TestRunDir:
    """Hydra-1.1 auto-chdir parity (reference train.py:46): default is a
    per-run outputs/<date>/<time>/ dir; hydra.run.dir=DIR redirects;
    hydra.run.dir=. opts out."""

    def _cfg(self, overrides):
        c = default_config()
        apply_overrides(c, overrides)
        return c

    def test_default_is_dated_outputs_dir(self):
        import re

        import train as train_cli

        run_dir = train_cli.resolve_run_dir(self._cfg([]))
        assert re.fullmatch(
            r"outputs/\d{4}-\d{2}-\d{2}/\d{2}-\d{2}-\d{2}", run_dir
        ), run_dir

    def test_override_and_optout(self, tmp_path, monkeypatch):
        import os

        import train as train_cli

        cfg = self._cfg([f"hydra.run.dir={tmp_path}/sub"])
        assert train_cli.resolve_run_dir(cfg) == f"{tmp_path}/sub"
        monkeypatch.chdir(tmp_path)
        train_cli.enter_run_dir(cfg)
        assert os.getcwd() == str(tmp_path / "sub")

        # opt-out: no chdir
        monkeypatch.chdir(tmp_path)
        train_cli.enter_run_dir(self._cfg(["hydra.run.dir=."]))
        assert os.getcwd() == str(tmp_path)

    def test_enter_creates_dated_dir(self, tmp_path, monkeypatch):
        import os

        import train as train_cli

        monkeypatch.chdir(tmp_path)
        train_cli.enter_run_dir(self._cfg([]))
        cwd = os.getcwd()
        assert cwd.startswith(str(tmp_path / "outputs"))

    def test_input_paths_anchor_to_launch_cwd(self, tmp_path, monkeypatch):
        """Relative *input* paths (data dirs, weight files, an explicit
        checkpoint_dir) must survive the Hydra-style chdir: they are
        anchored to the launch cwd before entering the run dir. Output
        paths (runs/...) stay relative — they belong inside the run dir."""
        import os

        import train as train_cli

        monkeypatch.chdir(tmp_path)
        cfg = self._cfg(
            [
                "training.vgg_weights=weights/vgg19.pth",
                "training.checkpoint_dir=stable_ckpt",
                "data.val_image_dir=val_hr",
            ]
        )
        train_cli.enter_run_dir(cfg)
        assert os.getcwd() != str(tmp_path)  # chdir happened
        assert cfg.data.image_dir == str(tmp_path / "data" / "DIV2K")
        assert cfg.data.numpy_dir == str(tmp_path / "data" / "div2k_np")
        assert cfg.data.val_image_dir == str(tmp_path / "val_hr")
        assert cfg.training.vgg_weights == str(tmp_path / "weights/vgg19.pth")
        assert cfg.training.checkpoint_dir == str(tmp_path / "stable_ckpt")

    def test_vgg_sentinels_and_absolute_paths_untouched(
        self, tmp_path, monkeypatch
    ):
        import train as train_cli

        monkeypatch.chdir(tmp_path)
        cfg = self._cfg(
            ["training.vgg_weights=init", "data.image_dir=/abs/div2k"]
        )
        train_cli.enter_run_dir(cfg)
        assert cfg.training.vgg_weights == "init"
        assert cfg.data.image_dir == "/abs/div2k"

    def test_optout_leaves_paths_alone(self, tmp_path, monkeypatch):
        import train as train_cli

        monkeypatch.chdir(tmp_path)
        cfg = self._cfg(["hydra.run.dir=."])
        train_cli.enter_run_dir(cfg)
        assert cfg.data.image_dir == "data/DIV2K"  # no chdir, no rewrite

    def test_multihost_requires_explicit_run_dir(self, tmp_path, monkeypatch):
        """Timestamped defaults diverge across hosts launched a second
        apart; multihost must demand a shared explicit dir."""
        import pytest as _pytest

        import train as train_cli

        monkeypatch.chdir(tmp_path)
        cfg = self._cfg(["parallel.multihost=true"])
        with _pytest.raises(SystemExit, match="hydra.run.dir"):
            train_cli.enter_run_dir(cfg)
        # explicit dir: fine
        train_cli.enter_run_dir(
            self._cfg(["parallel.multihost=true", f"hydra.run.dir={tmp_path}/m"])
        )

    def test_resume_warning_points_at_prior_runs(
        self, tmp_path, monkeypatch, capsys
    ):
        import train as train_cli

        monkeypatch.chdir(tmp_path)
        prior = tmp_path / "outputs/2026-01-01/00-00-00/runs/SRGAN/ckpt"
        prior.mkdir(parents=True)
        train_cli.enter_run_dir(self._cfg([]))
        out = capsys.readouterr().out
        assert "will NOT resume" in out and "2026-01-01" in out

    def test_no_resume_warning_without_prior_runs(
        self, tmp_path, monkeypatch, capsys
    ):
        import train as train_cli

        monkeypatch.chdir(tmp_path)
        train_cli.enter_run_dir(self._cfg([]))
        assert "will NOT resume" not in capsys.readouterr().out
