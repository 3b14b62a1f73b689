"""Environment-compat shims (vendored-dependency activation)."""
