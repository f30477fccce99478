from .driver import Main
from .checkpoint import save_checkpoint, load_checkpoint
