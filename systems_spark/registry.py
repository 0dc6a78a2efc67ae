"""Model registry resolution.

Reference semantics: ``ModelRegistry`` is a tiny interface with
``get_artifact_uri()``; ``MLFlowModelRegistry(name, version|stage)`` resolves
a model's artifact URI from an MLflow tracking server
(reference: merlin/systems/model_registry.py:6-61).

Spark-first: identical shape; MLflow is import-gated (not in this
container); a filesystem registry covers the common artifacts-on-shared-
storage layout.
"""

from __future__ import annotations

import os


class ModelRegistry:
    """Interface: resolve where a model's artifacts live
    (model_registry.py:6-16)."""

    def get_artifact_uri(self) -> str:  # pragma: no cover - interface
        raise NotImplementedError


class FileSystemModelRegistry(ModelRegistry):
    """Versioned directory layout: <root>/<name>/<version>/ — ``version=None``
    resolves the highest numeric version present."""

    def __init__(self, root: str, name: str, version=None):
        self.root = root
        self.name = name
        self.version = version

    def get_artifact_uri(self) -> str:
        base = os.path.join(self.root, self.name)
        version = self.version
        if version is None:
            versions = sorted(
                (d for d in os.listdir(base) if d.isdigit()), key=int
            )
            if not versions:
                raise FileNotFoundError(f"no versions under {base}")
            version = versions[-1]
        uri = os.path.join(base, str(version))
        if not os.path.isdir(uri):
            raise FileNotFoundError(uri)
        return uri


class MLFlowModelRegistry(ModelRegistry):
    """Resolve from an MLflow registry (model_registry.py:19-61).
    Import-gated: raises a clear error when mlflow isn't installed."""

    def __init__(self, name: str, version=None, stage=None, tracking_uri=None):
        self.name = name
        self.version = version
        self.stage = stage
        self.tracking_uri = tracking_uri

    def get_artifact_uri(self) -> str:
        try:
            import mlflow
        except ImportError as exc:  # pragma: no cover
            raise ImportError(
                "mlflow is not installed; use FileSystemModelRegistry or "
                "install mlflow"
            ) from exc
        client = mlflow.tracking.MlflowClient(tracking_uri=self.tracking_uri)
        if self.version is None:
            if self.stage is None:
                raise ValueError("need version or stage")
            versions = client.get_latest_versions(self.name, stages=[self.stage])
            if not versions:
                raise FileNotFoundError(
                    f"no {self.name} version in stage {self.stage}"
                )
            return versions[0].source
        return client.get_model_version(self.name, str(self.version)).source
