from .torch_convert import convert_torch_checkpoint

__all__ = ['convert_torch_checkpoint']
