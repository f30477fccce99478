from . import constants, conversion, helpers
