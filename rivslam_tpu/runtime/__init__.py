"""Native (C++) runtime: mmap'd dataset container + prefetching loader.

Build happens lazily on first import of `rivslam_tpu.runtime.native`; the
shared library is cached next to the source.
"""
