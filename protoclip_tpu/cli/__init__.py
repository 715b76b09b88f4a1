"""Command-line entry points (`python -m protoclip_tpu.cli.main`)."""
