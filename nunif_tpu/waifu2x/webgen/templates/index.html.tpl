<!doctype html>
<!-- ${generated_note} -->
<html lang="${lang}">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<meta name="description" content="${description}">
<title>${title}</title>
<style>
body { font-family: sans-serif; max-width: 46em; margin: 2em auto;
       padding: 0 1em; color: #222; }
h1 { font-size: 1.6em; }
fieldset { border: 1px solid #bbb; border-radius: 4px; margin: 1em 0; }
legend { font-weight: bold; }
.hint { color: #666; font-size: 0.85em; }
.langs { font-size: 0.8em; margin-top: 3em; color: #888; }
input[type=submit] { font-size: 1.1em; padding: 0.3em 2em; }
</style>
</head>
<body>
<h1>${title}</h1>
<p>${description}</p>
<form action="/api" method="post" enctype="multipart/form-data">
  <fieldset>
    <legend>${image_choosing}</legend>
    <p><label>${choose_file} <input type="file" name="file"></label></p>
    <p><label>${type_url} <input type="text" name="url" size="48"></label></p>
    <p class="hint">${file_limits}</p>
  </fieldset>
  <fieldset>
    <legend>${options}</legend>
    <p><label>${style}
      <select name="style">
        <option value="art">${artwork}</option>
        <option value="photo">${photo}</option>
      </select></label>
    <label>${noise_reduction}
      <select name="noise">
        <option value="-1">${nr_none}</option>
        <option value="0">${nr_low}</option>
        <option value="1">${nr_medium}</option>
        <option value="2">${nr_high}</option>
        <option value="3">${nr_highest}</option>
      </select></label>
    <label>${upscaling}
      <select name="scale">
        <option value="2">2x</option>
        <option value="1">${up_none}</option>
      </select></label>
    <label>${image_format}
      <select name="format">
        <option value="png">PNG</option>
        <option value="webp">WebP</option>
      </select></label></p>
    <p class="hint">${nr_hint}</p>
  </fieldset>
  <p><input type="submit" value="${button_convert}"></p>
</form>
<p class="langs">${language_links}</p>
</body>
</html>
