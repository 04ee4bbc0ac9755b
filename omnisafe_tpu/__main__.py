"""CLI entry: ``python -m omnisafe_tpu <command> ...``."""

from omnisafe_tpu.utils.command_app import main

main()
