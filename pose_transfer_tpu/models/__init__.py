from .networks import (  # noqa: F401
    Block,
    Decoder,
    DeformableGenerator,
    Discriminator,
    Encoder,
    StackedGenerator,
    UNetGenerator,
    decoder_filters_for,
    encoder_filters_for,
)
