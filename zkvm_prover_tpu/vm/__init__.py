from .executor import Rv32Executor, build_native  # noqa: F401
from . import asm  # noqa: F401
