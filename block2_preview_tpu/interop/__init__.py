"""Interop with external MPS formats (StackBlock readwfn/writewfn)."""
