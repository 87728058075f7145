"""ctypes binding for the native C++ data-file parser (built later by
native/build.py). `parse_file` returns None until the .so exists, and
data/io.py falls back to the NumPy parser."""

def parse_file(path):
    return None
