from .consensus import consensus_config, consensus_for

__all__ = ["consensus_config", "consensus_for"]
