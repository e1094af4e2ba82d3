from .imagenet import prepare_imagenet1k

__all__ = ["prepare_imagenet1k"]
