from . import cmux_pallas
