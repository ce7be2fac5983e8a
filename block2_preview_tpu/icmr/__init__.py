"""Internally-contracted multireference methods (reference pyblock2/icmr/).

Built on the multireference Wick engine (`mrwick.py`): core/virtual
spaces contract like a Fermi vacuum while active-space operator strings
normal-order into spin-orbital RDMs supplied by CASCI/DMRG.
"""
