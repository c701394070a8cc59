from .host import PALLAS, VESTA, CurveSpec
from . import host, jaxcurve, srs

__all__ = ["PALLAS", "VESTA", "CurveSpec", "host", "jaxcurve", "srs"]
