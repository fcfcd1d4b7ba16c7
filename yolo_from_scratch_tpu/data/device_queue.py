"""Double-buffered host->device input queue.

The reference moves each batch to the device synchronously inside its
train loop (reference: train.py:896-903). Here transfers are issued one
batch AHEAD of consumption: while the device runs step N, batch N+1 is
already in flight over PCIe/ICI (jax.device_put is asynchronous), so the
transfer hides behind compute. Combined with the loader's background
prefetch thread this gives the full pipeline:

    decode+letterbox+targets (worker thread)
      -> device_put (async, one batch ahead)
        -> train_step (device)
"""

from __future__ import annotations

import jax
import numpy as np

from yolo_from_scratch_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding_for,
    image_sharding,
    pad_batch_to_multiple,
)


class DeviceQueue:
    """Iterate (images, targets, valid_count) already placed on device,
    one batch ahead of the consumer. With a mesh, batches are padded to a
    multiple of the `data` axis size and sharded batch-on-`data` (and, on
    a 2-D mesh, image rows on `space`)."""

    def __init__(self, loader, mesh=None, device=None):
        self.loader = loader
        self.mesh = mesh
        self.device = device

    def _place(self, images, targets):
        valid = images.shape[0]
        if self.mesh is not None and self.mesh.size > 1:
            if jax.process_count() > 1:
                # multi-host: this process holds only its local shard of
                # the global batch; assemble the global jax.Array from the
                # per-process pieces (parallel.distributed). Pad to this
                # process's share of the data axis.
                from yolo_from_scratch_tpu.parallel.distributed import (
                    make_global_batch,
                )

                n_local = max(
                    self.mesh.shape[DATA_AXIS] // jax.process_count(), 1)
                images, _ = pad_batch_to_multiple(np.asarray(images), n_local)
                targets = [
                    pad_batch_to_multiple(np.asarray(t), n_local)[0]
                    for t in targets
                ]
                g_images, g_targets = make_global_batch(
                    self.mesh, images, targets)
                return g_images, g_targets, valid
            n_data = self.mesh.shape[DATA_AXIS]
            images, _ = pad_batch_to_multiple(np.asarray(images), n_data)
            targets = [
                pad_batch_to_multiple(np.asarray(t), n_data)[0]
                for t in targets
            ]
            im_sh = image_sharding(self.mesh)
            return (jax.device_put(images, im_sh),
                    [jax.device_put(t, batch_sharding_for(self.mesh, t))
                     for t in targets], valid)
        # local_devices, not devices: after jax.distributed.initialize the
        # global list starts with process 0's chips, which other processes
        # cannot device_put to
        dev = self.device or jax.local_devices()[0]
        return (jax.device_put(images, dev),
                [jax.device_put(t, dev) for t in targets], valid)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        pending = None
        for images, targets in self.loader:
            staged = self._place(images, targets)  # async transfer
            if pending is not None:
                yield pending
            pending = staged
        if pending is not None:
            yield pending
