"""Native (C++/OpenMP) host-side kernels.

The reference is pure Python and leans on joblib/multiprocessing for its
host-CPU hot loops (SURVEY.md §2); these are re-implemented as shared-memory
C++ kernels bound via ctypes (no pybind11 in this environment):

- ``sweep``: threshold-mixture Pareto search (EE/thresh.py, EE/large_scale.py)
"""

from multi_modal_early_exit_tpu.native import sweep  # noqa: F401
