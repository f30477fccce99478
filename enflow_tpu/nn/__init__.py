from . import mlp, egcl, argmax, floor
