from . import babybear, ext4

__all__ = ["babybear", "ext4"]
