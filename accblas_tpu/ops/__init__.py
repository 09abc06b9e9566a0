from . import df64

__all__ = ["df64"]
