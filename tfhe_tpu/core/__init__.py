from . import lwe, keys, bootstrap, crypt
