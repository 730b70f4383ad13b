from tvc.augment.text_augment import (  # noqa: F401
    ParaphraseGenerator,
    SynonymReplacer,
    SyntaxTransformer,
    TemplateAugmenter,
    TextAugmentConfig,
    TextAugmenter,
    create_text_augmenter,
    is_valid_text,
    normalize_text,
)
