"""CLI tools package.

A real (non-namespace) package on purpose: parity tests put /root/reference
on sys.path, whose tools/ directory would otherwise merge with (and, when it
comes first, shadow) this one as a PEP 420 namespace package.
"""
