from .chainstore import ChainStore, open_reader

__all__ = ["ChainStore", "open_reader"]
