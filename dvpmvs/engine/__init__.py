from .state import PMState, PassOutput
from .patchmatch import run_pass, make_pass_fn

__all__ = ["PMState", "PassOutput", "run_pass", "make_pass_fn"]
