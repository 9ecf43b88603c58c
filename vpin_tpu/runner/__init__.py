from . import proof_runner, cli

__all__ = ["proof_runner", "cli"]
