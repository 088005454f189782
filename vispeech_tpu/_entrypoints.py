"""Console-script entry points (pyproject.toml [project.scripts])."""

from vispeech_tpu.train.cli import main as train_main  # noqa: F401
