"""CLI entry points mirroring the reference's 19 programs (SURVEY.md A32)."""
from tpu_joints.cli.main import build_parser, main  # noqa: F401
