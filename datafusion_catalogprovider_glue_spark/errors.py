"""Error taxonomy for the Glue→Spark catalog layer.

Mirrors the reference's ``GlueError`` enum
(``/root/reference/src/error.rs:12-60``): ``NotImplemented``, ``AWS``,
``DataFusion`` (here: Spark), ``GlueDataTypeMapping``, ``Deltalake``,
``Other`` — re-expressed as an idiomatic Python exception hierarchy.
"""

from __future__ import annotations


class GlueError(Exception):
    """Base error for the catalog layer (reference: error.rs:12)."""


class NotImplementedYet(GlueError):
    """Feature the catalog deliberately doesn't support yet
    (reference: error.rs:14 ``GlueError::NotImplemented``)."""


class AwsError(GlueError):
    """Error talking to the (possibly fake) Glue API
    (reference: error.rs:16 ``GlueError::AWS``)."""


class SparkError(GlueError):
    """Error from the execution engine while registering/reading a table
    (reference: error.rs:18 ``GlueError::DataFusion`` — ours is Spark)."""


class TypeMappingError(GlueError):
    """Glue type string could not be parsed/mapped
    (reference: error.rs:20 ``GlueError::GlueDataTypeMapping``)."""


class DeltaError(GlueError):
    """Delta table could not be loaded
    (reference: error.rs:22 ``GlueError::Deltalake``)."""


def wrap_error_with_table_info(database: str, table: str, err: Exception) -> Exception:
    """Prefix an error with ``db.table`` context, like the reference's
    ``wrap_error_with_table_info`` (glue.rs:335-346) which rewraps
    NotImplemented errors with the fully-qualified table name."""
    if isinstance(err, NotImplementedYet):
        return NotImplementedYet(f"Error for table: {database}.{table}: {err}")
    return err
