from .plots import mpcplot, showandsave, tracking_dashboard
from .animation import simulate
