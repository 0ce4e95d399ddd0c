"""Native C++ kernels (host-side) with ctypes bindings."""
