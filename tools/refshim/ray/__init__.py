"""Minimal ray stand-in: the reference uses ray.util.multiprocessing.Pool as
a drop-in process pool; here it runs in-process (serial) for golden
generation."""
