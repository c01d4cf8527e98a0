SELECT report_id, entity, entity_id, severity, rule, detail FROM (VALUES
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Dataset', 'E5E5E5E5E5E5E5E5E5E5E5E5E5E5E5E5', 'warning', 'dataset_without_atributos', 'dataset ''Atalho X'' has no atributos'),
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Dataset', 'E5E5E5E5E5E5E5E5E5E5E5E5E5E5E5E5', 'warning', 'dataset_without_metricas', 'dataset ''Atalho X'' has no metricas'),
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Dataset', 'F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6', 'warning', 'dataset_without_atributos', 'dataset ''Fantasma'' has no atributos'),
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Dataset', 'F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6', 'warning', 'dataset_without_metricas', 'dataset ''Fantasma'' has no metricas'),
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Form', '1B369614C7BAFF0E2F2C4360B34B0A56', 'warning', 'form_without_tables', 'form ''Descrição'' has no logic tables'),
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Form', '1B369614C7BAFF0E2F2C4360B34B0A56', 'warning', 'form_without_tables', 'form ''Descrição'' has no logic tables'),
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Metric', 'A3A3A3A3A3A3A3A3A3A3A3A3A3A3A3A3', 'warning', 'composite_without_children', 'composite metric ''Ciclo B'' has no components'),
  ('A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1A1', 'Metric', 'C5C5C5C5C5C5C5C5C5C5C5C5C5C5C5C5', 'error', 'tipo_enum', 'tipo not simples|composto: ''embedded'''),
  ('B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2', 'Dataset', 'F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6', 'warning', 'dataset_without_atributos', 'dataset ''Fantasma'' has no atributos'),
  ('B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2B2', 'Dataset', 'F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6F6', 'warning', 'dataset_without_metricas', 'dataset ''Fantasma'' has no metricas')
) AS golden(report_id, entity, entity_id, severity, rule, detail)
