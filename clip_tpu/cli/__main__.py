import sys

from . import dispatch

sys.exit(dispatch())
