from .networks import ImplicitNet, RenderingNet

__all__ = ["ImplicitNet", "RenderingNet"]
