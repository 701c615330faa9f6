from lfb_tpu.bank.lfb import get_lfb, load_lfb, write_lfb
