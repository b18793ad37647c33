from .symeig3x3 import symeig3x3

__all__ = ["symeig3x3"]
