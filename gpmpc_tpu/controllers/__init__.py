from .controller import GpMpcController, IterationInformation

__all__ = ["GpMpcController", "IterationInformation"]
