"""Error hierarchy matching the reference's.

Parity: ``/root/reference/oakstore/store.py:37-46`` defines
``OakStoreError <- SchemaError, ItemKeyError``; plain ``ValueError`` is
raised for key-exists / key-missing conditions (store.py:204,222,248).
"""


class OakStoreError(Exception):
    """Base class for all oakstore_spark errors."""


class SchemaError(OakStoreError):
    """Input data does not match the store's declared schema."""


class ItemKeyError(OakStoreError):
    """Item key fails the key-charset rule."""


class ConcurrentCommitError(OakStoreError):
    """EXT (manifest protocol): another writer published the manifest
    version this writer was about to publish. The caller should re-read
    the latest manifest and retry its commit on top of it."""
