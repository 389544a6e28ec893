"""General utilities: seeding, directories, notebook plotting.

Reference: ``utils.py:19-42,112-161``.
"""

from .misc import seed, prepare_dir, plot_help, sweep_done, write_sweep_marker
