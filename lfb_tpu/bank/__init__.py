from lfb_tpu.bank.lfb import get_lfb, load_lfb, write_lfb
from lfb_tpu.bank.device_bank import (AvaDeviceBank, FrameDeviceBank,
                                      ShardedDeviceBank, build_device_bank,
                                      shard_bank)
