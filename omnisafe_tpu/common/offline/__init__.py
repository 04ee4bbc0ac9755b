"""Offline data pipeline (reference layer: omnisafe/common/offline/**)."""

from omnisafe_tpu.common.offline.data_collector import OfflineDataCollector
from omnisafe_tpu.common.offline.dataset import OfflineDataset

__all__ = ['OfflineDataset', 'OfflineDataCollector']
