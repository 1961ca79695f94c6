"""Minimal pkg_resources stand-in: resource_stream for the reference's
packaged CSV data files."""
import os


def resource_stream(package, path):
    base = os.path.join("/root/reference/src", *package.split("."))
    if not os.path.isdir(base):  # module name, not a package dir
        base = os.path.dirname(base)
    return open(os.path.join(base, path), "rb")
