from .errors import (DegenerateGeometryError, FileFormatError, PwICPError,
                     RegistrationFailedError)
from .logging import PhaseTimer, log

__all__ = ["DegenerateGeometryError", "FileFormatError", "PwICPError",
           "RegistrationFailedError", "PhaseTimer", "log"]
